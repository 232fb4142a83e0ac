"""Pallas TPU flash attention.

Kernel for the model's two hot attention shapes (SURVEY.md §1 hot spots):
the 3D ViT's 2049-token self-attention (12 layers × B·T chunk batch) and the
decoder's multimodal prefill (1024-2048 tokens, GQA).

Design (block-q, resident-KV): sequence lengths here are ≤ 4K and head_dim
≤ 128, so K/V for one (batch, kv-head) fit comfortably in VMEM
(4096×128×bf16 = 1 MB). Each grid program loads one q block and the whole
K/V once, computes the exact softmax over the full row (no online-softmax
state to carry), and writes one output block. HBM traffic is O(S·D) per
head — the flash-attention ideal — while avoiding the multi-pass m/l
bookkeeping that only pays off when K/V exceed VMEM.

Masking: per-row valid KV lengths (right-padded batches) via scalar
prefetch, plus an optional causal constraint. GQA is expressed in the
BlockSpec index map (q head h reads kv head h // group) — no KV repeat is
materialized.

Backward: custom VJP with a Pallas flash backward (LSE recompute pass +
dq kernel + dk/dv kernel, all O(S·D) memory). On TPU the backward is
selected by sequence length (Pallas at S ≥ 2048, dense XLA recompute
below — measured crossover, see ``_FLASH_BWD_MIN_SEQ``); ``U2_FLASH_BWD``
=1/=0 forces either side. The CPU path always recomputes densely in XLA.
Forward-pass memory stays O(S·D) either way.

Measured on TPU v5e (bf16, in-jit loop timing): decoder prefill
(4, 2048, 16h/8kv, 128) causal: 2.82 ms vs 4.12 ms XLA SDPA (1.46x);
ViT (8, 2049, 12, 64): 4.25 ms (block_q=512) vs 5.89 ms XLA (1.39x).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, bq: int, sk: int,
            causal: bool, scale: float):
    b = pl.program_id(0)
    qi = pl.program_id(2)

    q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, D)
    k = k_ref[0, 0]                                      # (Sk, D)
    scores = jax.lax.dot_general(
        q, k.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # (bq, Sk)

    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (bq, sk), 1)
    valid = kv_idx < lens_ref[b]
    if causal:
        q_idx = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, sk), 0)
        valid = valid & (kv_idx <= q_idx)
    scores = jnp.where(valid, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                preferred_element_type=jnp.float32)      # (bq, D)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _kernel_causal_chunked(lens_ref, q_ref, k_ref, v_ref, o_ref, *, bq: int,
                           bk: int, sk_pad: int, scale: float):
    """Causal q-block kernel with key-chunk skipping.

    The one-shot kernel computes scores against ALL keys — for causal
    attention half of them are fully masked. Here the key axis is walked in
    ``bk`` chunks with an online softmax, and the fori_loop bound stops at
    the q block's causal frontier, halving causal-prefill FLOPs (the prefill
    is MXU-bound at these shapes).
    """
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, D)
    d = q.shape[-1]
    valid_len = lens_ref[b]
    n_chunks = (qi * bq + bq + bk - 1) // bk             # causal frontier

    def body(ki, carry):
        acc, m, l = carry
        k = k_ref[0, 0, pl.ds(ki * bk, bk), :]           # (bk, D)
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, bk)
        kv_idx = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        q_idx = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
        s = jnp.where((kv_idx < valid_len) & (kv_idx <= q_idx), s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0, pl.ds(ki * bk, bk), :]           # (bk, D)
        pv = jnp.dot(p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
        return acc * alpha + pv, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, n_chunks, body, (acc0, m0, l0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_raw(q, k, v, lens, causal: bool, scale: float, bq: int,
               interpret: bool):
    """q: (B, H, Sq, D); k/v: (B, Hkv, Sk, D); lens: (B,) int32."""
    b, h, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    group = h // hkv
    sq_pad = (sq + bq - 1) // bq * bq
    if sq_pad != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    bk = 512
    sk_pad = sk
    if causal:
        # chunked kernel: pad keys to a bk multiple (padding masked by lens)
        sk_pad = (sk + bk - 1) // bk * bk
        if sk_pad != sk:
            k = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, sq_pad // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d),
                         lambda bi, hi, qi, lens: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, sk_pad, d),
                         lambda bi, hi, qi, lens: (bi, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, sk_pad, d),
                         lambda bi, hi, qi, lens: (bi, hi // group, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda bi, hi, qi, lens: (bi, hi, qi, 0)),
    )
    if causal:
        kernel = functools.partial(_kernel_causal_chunked, bq=bq, bk=bk,
                                   sk_pad=sk_pad, scale=scale)
    else:
        kernel = functools.partial(_kernel, bq=bq, sk=sk, causal=False,
                                   scale=scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        interpret=interpret,
    )(lens.astype(jnp.int32), q, k, v)
    return out[:, :, :sq]


def _lse_kernel(lens_ref, q_ref, k_ref, l_ref, *, bq: int, bk: int,
                causal: bool, scale: float):
    """Row logsumexp of the masked scaled scores for one q block — the
    softmax statistic the backward kernels need to recompute p without
    carrying it from the forward (which stays untouched/proven)."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, D)
    sk_pad = k_ref.shape[2]
    valid_len = lens_ref[b]
    n_chunks = ((qi * bq + bq + bk - 1) // bk) if causal else (sk_pad // bk)

    def body(ki, carry):
        m, l = carry
        kk = k_ref[0, 0, pl.ds(ki * bk, bk), :]
        s = jax.lax.dot_general(
            q, kk.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, bk)
        kv_idx = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = kv_idx < valid_len
        if causal:
            q_idx = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0)
            valid = valid & (kv_idx <= q_idx)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        l_new = l * jnp.exp(m - m_new) + jnp.sum(
            jnp.exp(s - m_new), axis=-1, keepdims=True)
        return m_new, l_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    m, l = jax.lax.fori_loop(0, n_chunks, body, (m0, l0))
    # rows carry a trailing singleton lane axis: Mosaic requires the last
    # two BLOCK dims to be (8k, 128k) or match the array dims — (bq, 1)
    # with a size-1 trailing array dim satisfies that; (1, bq) does not
    # (r4 on-chip lowering failure at h=16).
    l_ref[0, 0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _dq_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref, l_ref, dd_ref,
               dq_ref, *, bq: int, bk: int, causal: bool, scale: float):
    """dq for one q block: walk KV in chunks (stopping at the causal
    frontier), recompute p from the saved logsumexp, accumulate
    ds·K·scale. All intermediates are (bq, bk) — O(S·D) HBM."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)                  # (bq, D)
    do = do_ref[0, 0].astype(jnp.float32)                # (bq, D)
    lse = l_ref[0, 0]                                    # (bq, 1)
    dd = dd_ref[0, 0]                                    # (bq, 1)
    sk_pad = k_ref.shape[2]
    valid_len = lens_ref[b]
    n_chunks = ((qi * bq + bq + bk - 1) // bk) if causal else (sk_pad // bk)

    def body(ki, acc):
        kk = k_ref[0, 0, pl.ds(ki * bk, bk), :].astype(jnp.float32)
        vv = v_ref[0, 0, pl.ds(ki * bk, bk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, kk, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (bq, bk)
        kv_idx = ki * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = kv_idx < valid_len
        if causal:
            q_idx = qi * bq + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk), 0)
            valid = valid & (kv_idx <= q_idx)
        s = jnp.where(valid, s, NEG_INF)
        p = jnp.exp(s - lse)                             # masked -> 0
        dp = jax.lax.dot_general(
            do, vv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (bq, bk)
        ds = p * (dp - dd)
        return acc + jnp.dot(ds, kk,
                             preferred_element_type=jnp.float32) * scale

    acc = jax.lax.fori_loop(0, n_chunks, body,
                            jnp.zeros(q.shape, jnp.float32))
    dq_ref[0, 0] = acc.astype(dq_ref.dtype)


def _dkv_kernel(lens_ref, q_ref, k_ref, v_ref, do_ref, l_ref, dd_ref,
                dk_ref, dv_ref, *, bq: int, bk2: int, causal: bool,
                scale: float, group: int):
    """dk/dv for one kv block: for each q head of the GQA group, walk q
    blocks from the causal frontier, recompute p and accumulate
    dv += pᵀ·do and dk += dsᵀ·q·scale."""
    b = pl.program_id(0)
    ki = pl.program_id(2)
    kk = k_ref[0, 0].astype(jnp.float32)                 # (bk2, D)
    vv = v_ref[0, 0].astype(jnp.float32)
    sq_pad = q_ref.shape[2]
    valid_len = lens_ref[b]
    nq = sq_pad // bq
    start = (ki * bk2) // bq if causal else 0
    dk = jnp.zeros(kk.shape, jnp.float32)
    dv = jnp.zeros(vv.shape, jnp.float32)
    for g in range(group):  # static unroll over the GQA group
        def body(qj, carry):
            dk, dv = carry
            qb = q_ref[0, g, pl.ds(qj * bq, bq), :].astype(jnp.float32)
            dob = do_ref[0, g, pl.ds(qj * bq, bq), :].astype(jnp.float32)
            lse = l_ref[0, g, pl.ds(qj * bq, bq), :]     # (bq, 1)
            dd = dd_ref[0, g, pl.ds(qj * bq, bq), :]     # (bq, 1)
            s = jax.lax.dot_general(
                qb, kk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (bq, bk2)
            kv_idx = ki * bk2 + jax.lax.broadcasted_iota(
                jnp.int32, (bq, bk2), 1)
            valid = kv_idx < valid_len
            if causal:
                q_idx = qj * bq + jax.lax.broadcasted_iota(
                    jnp.int32, (bq, bk2), 0)
                valid = valid & (kv_idx <= q_idx)
            s = jnp.where(valid, s, NEG_INF)
            p = jnp.exp(s - lse)                         # (bq, bk2)
            dv = dv + jax.lax.dot_general(
                p, dob, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bk2, D)
            dp = jax.lax.dot_general(
                dob, vv, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)      # (bq, bk2)
            ds = p * (dp - dd)
            dk = dk + jax.lax.dot_general(
                ds, qb, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            return dk, dv

        dk, dv = jax.lax.fori_loop(start, nq, body, (dk, dv))
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _flash_bwd_raw(q, k, v, lens, out, do, causal: bool, scale: float,
                   bq: int, interpret: bool):
    """Pallas flash backward: (dq, dk, dv), all O(S·D) HBM traffic."""
    b, h, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    group = h // hkv
    bk = 512        # kv chunk inside the lse/dq loops
    bk2 = 256       # kv block of the dk/dv grid
    sq_pad = (sq + bq - 1) // bq * bq
    sk_pad = (sk + bk - 1) // bk * bk   # bk2 divides bk
    pad_q = lambda x: jnp.pad(
        x, ((0, 0), (0, 0), (0, sq_pad - sq), (0, 0)))
    pad_k = lambda x: jnp.pad(
        x, ((0, 0), (0, 0), (0, sk_pad - sk), (0, 0)))
    qp, dop, outp = pad_q(q), pad_q(do), pad_q(out)
    kp, vp = pad_k(k), pad_k(v)
    # D_i = sum_d dO_i · O_i (padded rows are zero, so they contribute 0
    # to every kernel below even where recomputed p is nonzero). Row
    # statistics (dd, lse) carry a trailing singleton lane axis so their
    # block specs satisfy Mosaic's last-two-dims rule (see _lse_kernel).
    dd = jnp.sum(dop.astype(jnp.float32) * outp.astype(jnp.float32),
                 axis=-1)[..., None]                      # (B, H, Sq_pad, 1)
    lens = lens.astype(jnp.int32)

    qspec = pl.BlockSpec((1, 1, bq, d), lambda bi, hi, qi, lens: (bi, hi, qi, 0))
    kspec = pl.BlockSpec((1, 1, sk_pad, d),
                         lambda bi, hi, qi, lens: (bi, hi // group, 0, 0))
    rowspec = pl.BlockSpec((1, 1, bq, 1),
                           lambda bi, hi, qi, lens: (bi, hi, qi, 0))

    lse = pl.pallas_call(
        functools.partial(_lse_kernel, bq=bq, bk=bk, causal=causal,
                          scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b, h, sq_pad // bq),
            in_specs=[qspec, kspec], out_specs=rowspec),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, 1), jnp.float32),
        interpret=interpret,
    )(lens, qp, kp)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, bq=bq, bk=bk, causal=causal,
                          scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b, h, sq_pad // bq),
            in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
            out_specs=qspec),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_pad, d), q.dtype),
        interpret=interpret,
    )(lens, qp, kp, vp, dop, lse, dd)

    gqspec = pl.BlockSpec((1, group, sq_pad, d),
                          lambda bi, hi, ki, lens: (bi, hi, 0, 0))
    growspec = pl.BlockSpec((1, group, sq_pad, 1),
                            lambda bi, hi, ki, lens: (bi, hi, 0, 0))
    kvblock = pl.BlockSpec((1, 1, bk2, d),
                           lambda bi, hi, ki, lens: (bi, hi, ki, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, bq=bq, bk2=bk2, causal=causal,
                          scale=scale, group=group),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b, hkv, sk_pad // bk2),
            in_specs=[gqspec, kvblock, kvblock, gqspec, growspec, growspec],
            out_specs=[kvblock, kvblock]),
        out_shape=[jax.ShapeDtypeStruct((b, hkv, sk_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((b, hkv, sk_pad, d), v.dtype)],
        interpret=interpret,
    )(lens, qp, kp, vp, dop, lse, dd)
    return dq[:, :, :sq], dk[:, :, :sk], dv[:, :, :sk]


# Measured crossover for the Pallas backward vs XLA's fused dense
# recompute (real v5e chip, 1.7B SFT B=1, docs/artifacts/r4/):
#   S=1024: 0.225 s/step pallas vs 0.216 XLA  -> XLA wins (~4%)
#   S=4096: 0.612 s/step pallas vs 0.902 XLA  -> pallas wins (1.47x)
# The dense recompute materializes the (H, Sq, Sk) score matrix, so its
# HBM traffic grows ~S^2 while the three-kernel flash backward stays
# O(S*D); between the two measured points the threshold sits at 2048.
_FLASH_BWD_MIN_SEQ = 2048


def _flash_bwd_enabled(sq: int) -> bool:
    """TPU backward selection: U2_FLASH_BWD=1 forces the Pallas kernels,
    =0 forces the dense XLA recompute, unset picks by sequence length
    (Pallas at S >= 2048 per the measured A/B above)."""
    import os

    flag = os.environ.get("U2_FLASH_BWD")
    if flag is not None:
        return flag == "1"
    return sq >= _FLASH_BWD_MIN_SEQ


def _reference(q, k, v, lens, causal: bool, scale: float):
    """XLA reference (used for the VJP recompute and CPU fallback)."""
    b, h, sq, d = q.shape
    hkv, sk = k.shape[1], k.shape[2]
    group = h // hkv
    qg = q.reshape(b, hkv, group, sq, d)
    scores = jnp.einsum("bhgqd,bhkd->bhgqk", qg.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    kv_idx = jnp.arange(sk)
    valid = kv_idx[None, :] < lens[:, None]              # (B, Sk)
    mask = valid[:, None, None, None, :]
    if causal:
        mask = mask & (kv_idx[None, :] <= jnp.arange(sq)[:, None])[
            None, None, None, :, :]
    scores = jnp.where(mask, scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhgqk,bhkd->bhgqd", p.astype(v.dtype), v)
    return o.reshape(b, h, sq, d).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _flash(q, k, v, lens, causal, scale, bq, interpret):
    if interpret is None:
        # product paths: real kernel on TPU, XLA math on CPU (interpret-mode
        # pallas is too slow for anything but tests, which pass
        # interpret=True explicitly to exercise the kernel itself).
        if jax.default_backend() == "cpu":
            return _reference(q, k, v, lens, causal, scale)
        interpret = False
    return _flash_raw(q, k, v, lens, causal, scale, bq, interpret)


def _flash_fwd(q, k, v, lens, causal, scale, bq, interpret):
    out = _flash(q, k, v, lens, causal, scale, bq, interpret)
    return out, (q, k, v, lens, out)


def _flash_bwd(causal, scale, bq, interpret, res, g):
    q, k, v, lens, out = res
    # pallas backward: interpret mode always (tests exercise the kernels);
    # on TPU behind the U2_FLASH_BWD opt-in, else the dense XLA recompute
    use_pallas = interpret is True or (
        jax.default_backend() == "tpu" and _flash_bwd_enabled(q.shape[2]))
    if use_pallas:
        dq, dk, dv = _flash_bwd_raw(q, k, v, lens, out, g, causal, scale,
                                    bq, interpret is True)
        return dq, dk, dv, None
    _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, lens, causal, scale),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,                 # (B, Sq, H, D)
    k: jax.Array,                 # (B, Sk, Hkv, D)
    v: jax.Array,                 # (B, Sk, Hkv, D)
    lens: Optional[jax.Array] = None,  # (B,) valid KV lengths
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flash attention in the framework's (B, S, H, D) layout.

    Drop-in for ops.attention.sdpa / gqa_sdpa on the padded-batch hot paths.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    if lens is None:
        lens = jnp.full((q.shape[0],), k.shape[1], jnp.int32)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    bq = min(block_q, 512)
    out = _flash(qt, kt, vt, lens, causal, scale, bq, interpret)
    return jnp.transpose(out, (0, 2, 1, 3))
