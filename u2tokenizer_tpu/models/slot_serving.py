"""Continuous-batching serving engine (slot-based decode).

Production-serving layer beyond the reference's one-request-at-a-time demo
path (src/demo/demo.py, green_refactored/lu2_model.py): a fixed pool of
``num_slots`` decode slots shares one batched KV cache; new requests prefill
into free slots while other slots keep decoding, so the chip never idles
between requests and per-request latency is decoupled from batch formation.

TPU-native design: every jitted function has static shapes — prefill is a
batch-1 forward whose K/V are inserted into the batched cache at a dynamic
slot index; the decode step advances ALL slots each call with per-row write
positions (decoder.Attention scatters at a (B,) write_index) and per-row
attention masks derived from (prompt_len, n_generated). Inactive slots
compute masked garbage — the cost of a slot is paid whether idle or busy,
which is exactly the continuous-batching bargain.

The host-side ``Engine`` is a plain scheduler: submit() enqueues, step()
either admits a pending request (prefill) or advances decoding one token for
everyone; finished rows (EOS / max_new_tokens) free their slot.
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import GenerationConfig
from ..ops.sampling import sample
from .llm.decoder import KVCache


@struct.dataclass
class SlotState:
    cache: KVCache
    tok: jax.Array          # (S,) int32 last sampled token per slot
    prompt_len: jax.Array   # (S,) int32
    n_gen: jax.Array        # (S,) int32 tokens generated so far
    active: jax.Array       # (S,) bool slot holds a live request
    done: jax.Array         # (S,) bool request hit EOS (still occupies slot
                            # until the host collects it)
    hist: Optional[jax.Array] = None  # (S, prompt_buf + max_new) int32 token
                            # history for speculative drafting (None when the
                            # engine runs the plain one-token step)


def make_slot_fns(model, gen: GenerationConfig, num_slots: int,
                  prompt_buf: int, cache_dtype=jnp.bfloat16):
    """Build (init_state, prefill_fn, decode_fn) for a slot pool.

    prefill_fn(params, state, embeds, prompt_len, slot) -> (state, tok0):
      batch-1 prefill; K/V written into the pooled cache at ``slot``.
    decode_fn(params, state, rng) -> (state, tokens (S,)):
      one token for every slot (inactive/done rows emit pad).
    """
    llm_cfg = model.cfg.llm if hasattr(model.cfg, "llm") else model.cfg
    total = prompt_buf + gen.max_new_tokens

    def init_state() -> SlotState:
        z = lambda dt: jnp.zeros((num_slots,), dt)
        return SlotState(
            cache=KVCache.create(llm_cfg, num_slots, total, cache_dtype),
            tok=z(jnp.int32), prompt_len=z(jnp.int32), n_gen=z(jnp.int32),
            active=z(bool), done=z(bool))

    @jax.jit
    def prefill_fn(params, state: SlotState, embeds, prompt_len, slot, rng):
        """embeds: (1, prompt_buf, E) right-padded; prompt_len/slot scalars."""
        from .u2_model import causal_padding_mask

        s = embeds.shape[1]
        one_cache = KVCache.create(llm_cfg, 1, total, cache_dtype)
        att = (jnp.arange(s)[None, :] < prompt_len).astype(jnp.int32)
        positions = jnp.arange(s, dtype=jnp.int32)[None]
        _, hidden, one_cache = model.apply(
            params, embeds, attention_mask=None, cache=one_cache,
            write_index=jnp.int32(0), positions=positions,
            mask=causal_padding_mask(att),
            lens=jnp.asarray([prompt_len], jnp.int32), compute_logits=False,
            method="forward_embeds")
        last_hidden = jax.lax.dynamic_slice_in_dim(
            hidden, prompt_len - 1, 1, axis=1)
        last = model.apply(params, last_hidden, method="lm_logits")[:, 0]
        tok0 = sample(rng, last, do_sample=gen.do_sample,
                      temperature=gen.temperature, top_p=gen.top_p)[0]

        ins = lambda big, small: jax.lax.dynamic_update_slice(
            big, small, (slot,) + (0,) * (big.ndim - 1))
        cache = jax.tree_util.tree_map(ins, state.cache, one_cache)
        return SlotState(
            cache=cache,
            tok=state.tok.at[slot].set(tok0),
            prompt_len=state.prompt_len.at[slot].set(prompt_len),
            n_gen=state.n_gen.at[slot].set(0),
            active=state.active.at[slot].set(True),
            done=state.done.at[slot].set(tok0 == gen.eos_token_id),
        ), tok0

    kv_pos = jnp.arange(total, dtype=jnp.int32)

    @jax.jit
    def decode_fn(params, state: SlotState, rng):
        emb = model.apply(params, state.tok[:, None], method="embed_tokens")
        pos = (state.prompt_len + state.n_gen)[:, None]
        # row visibility: its own prompt plus its own generated slots
        key_ok = (kv_pos[None, :] < state.prompt_len[:, None]) | (
            (kv_pos[None, :] >= prompt_buf) &
            (kv_pos[None, :] <= prompt_buf + state.n_gen[:, None]))
        write_index = prompt_buf + state.n_gen  # (S,) per-row scatter
        logits, _, cache = model.apply(
            params, emb, pos.astype(jnp.int32), key_ok[:, None, None, :],
            state.cache, write_index, method="decode_step")
        nxt = sample(rng, logits[:, 0], do_sample=gen.do_sample,
                     temperature=gen.temperature, top_p=gen.top_p)
        emit = state.active & ~state.done
        nxt = jnp.where(emit, nxt, jnp.int32(gen.pad_token_id))
        newly_done = emit & ((nxt == gen.eos_token_id) |
                             (state.n_gen + 1 >= gen.max_new_tokens))
        return SlotState(
            cache=cache, tok=nxt, prompt_len=state.prompt_len,
            n_gen=jnp.where(emit, state.n_gen + 1, state.n_gen),
            active=state.active, done=state.done | newly_done,
        ), nxt

    return init_state, prefill_fn, decode_fn


def make_spec_slot_fns(model, gen: GenerationConfig, num_slots: int,
                       prompt_buf: int, cache_dtype=jnp.bfloat16,
                       block_len: int = 8):
    """Speculative (greedy-only) slot functions: each decode call runs one
    n-gram-drafted verify block per slot and emits 1..block_len tokens, so
    the host drives ~mean-acceptance× fewer device steps — a large win where
    per-step dispatch latency is material (the axon relay costs ~30-40 ms
    per call). Tokens are bit-identical to the plain slot engine
    (models/speculative.py acceptance rule).

    Returns (init_state, prefill_fn, make_decode).
    make_decode(kbx) builds a decode over the SAME state layout with a
    ``kbx``-position verify block (1 <= kbx <= block_len; the cache slack
    is sized for block_len, so every smaller block shares the state):
    decode_fn(params, state, rng) -> (state, packed (S, kbx + 1)): row j
    emitted packed[j, :packed[j, -1]] (tokens and per-row counts packed
    into one array so the host fetches once per step). kbx=1 degenerates
    to a plain one-token step — the adaptive engine walks a ladder of
    block sizes between the two extremes without state surgery.
    """
    from .speculative import ngram_draft
    from .u2_model import causal_padding_mask

    if gen.do_sample:
        raise ValueError("speculative slot engine supports greedy only")
    llm_cfg = model.cfg.llm if hasattr(model.cfg, "llm") else model.cfg
    kb = block_len
    max_new = gen.max_new_tokens
    # +kb slack: a verify block near the last live slot writes past it
    total = prompt_buf + max_new + kb
    hist_len = prompt_buf + max_new

    def init_state() -> SlotState:
        z = lambda dt: jnp.zeros((num_slots,), dt)
        return SlotState(
            cache=KVCache.create(llm_cfg, num_slots, total, cache_dtype),
            tok=z(jnp.int32), prompt_len=z(jnp.int32), n_gen=z(jnp.int32),
            active=z(bool), done=z(bool),
            hist=jnp.full((num_slots, hist_len), -1, jnp.int32))

    @jax.jit
    def prefill_fn(params, state: SlotState, embeds, prompt_ids, prompt_len,
                   slot, rng):
        """embeds: (1, prompt_buf, E); prompt_ids: (1, prompt_buf) the raw
        prompt tokens (drafting history seed); prompt_len/slot scalars."""
        s = embeds.shape[1]
        one_cache = KVCache.create(llm_cfg, 1, total, cache_dtype)
        att = (jnp.arange(s)[None, :] < prompt_len).astype(jnp.int32)
        positions = jnp.arange(s, dtype=jnp.int32)[None]
        _, hidden, one_cache = model.apply(
            params, embeds, attention_mask=None, cache=one_cache,
            write_index=jnp.int32(0), positions=positions,
            mask=causal_padding_mask(att),
            lens=jnp.asarray([prompt_len], jnp.int32), compute_logits=False,
            method="forward_embeds")
        last_hidden = jax.lax.dynamic_slice_in_dim(
            hidden, prompt_len - 1, 1, axis=1)
        last = model.apply(params, last_hidden, method="lm_logits")[:, 0]
        tok0 = jnp.argmax(last, axis=-1).astype(jnp.int32)[0]

        ins = lambda big, small: jax.lax.dynamic_update_slice(
            big, small, (slot,) + (0,) * (big.ndim - 1))
        cache = jax.tree_util.tree_map(ins, state.cache, one_cache)
        row = jnp.full((hist_len,), -1, jnp.int32)
        row = jax.lax.dynamic_update_slice(
            row, jnp.where(att[0].astype(bool), prompt_ids[0], -1), (0,))
        row = row.at[prompt_buf].set(tok0)
        return SlotState(
            cache=cache,
            tok=state.tok.at[slot].set(tok0),
            prompt_len=state.prompt_len.at[slot].set(prompt_len),
            n_gen=state.n_gen.at[slot].set(0),
            active=state.active.at[slot].set(True),
            done=state.done.at[slot].set(tok0 == gen.eos_token_id),
            hist=state.hist.at[slot].set(row),
        ), tok0

    kv_pos = jnp.arange(total, dtype=jnp.int32)
    rows = jnp.arange(num_slots)

    def make_decode(kbx: int):
        """Verify-block decode with ``kbx`` positions over the SAME state
        layout. kbx=1 degenerates to the plain one-token step (no drafts) —
        the adaptive engine walks block sizes without state surgery."""
        if not 1 <= kbx <= kb:
            raise ValueError(f"block size {kbx} outside [1, {kb}] — the "
                             "cache slack is sized for block_len")
        koff = jnp.arange(kbx, dtype=jnp.int32)

        @jax.jit
        def decode_fn(params, state: SlotState, rng):
            del rng  # greedy
            n_w = state.n_gen                  # KV-written generated tokens
            pending = state.tok
            # n_gen counts decode-emitted tokens; +1 for the prefill token
            n_emit = state.n_gen + 1

            idx_last = prompt_buf + n_w
            prev = jnp.where(
                n_w >= 1,
                jnp.take_along_axis(
                    state.hist, jnp.clip(idx_last - 1, 0)[:, None],
                    axis=1)[:, 0],
                jnp.take_along_axis(
                    state.hist, jnp.clip(state.prompt_len - 1, 0)[:, None],
                    axis=1)[:, 0])
            prev2_idx = jnp.where(
                n_w >= 2, idx_last - 2,
                jnp.where(n_w == 1, state.prompt_len - 1,
                          state.prompt_len - 2))
            prev2 = jnp.take_along_axis(
                state.hist, jnp.clip(prev2_idx, 0)[:, None], axis=1)[:, 0]
            drafts = ngram_draft(state.hist, idx_last, prev, pending,
                                 kbx - 1, c00=prev2)

            f = jnp.concatenate([pending[:, None], drafts], axis=1)
            emb = model.apply(params, f, method="embed_tokens")
            pos = (state.prompt_len + n_w)[:, None] + koff[None, :]
            key_ok = (kv_pos[None, None, :]
                      < state.prompt_len[:, None, None]) | (
                (kv_pos[None, None, :] >= prompt_buf) &
                (kv_pos[None, None, :] <= (prompt_buf + n_w)[:, None, None]
                 + koff[None, :, None]))
            logits, _, cache = model.apply(
                params, emb, pos.astype(jnp.int32), key_ok[:, None],
                state.cache, prompt_buf + n_w, method="decode_step")
            g = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            match = f[:, 1:] == g[:, :-1]
            chain = jnp.cumprod(match.astype(jnp.int32), axis=1)
            c = 1 + jnp.sum(chain, axis=1)
            emitted_eos = (g == gen.eos_token_id) & (koff[None, :]
                                                     < c[:, None])
            first_eos = jnp.argmax(emitted_eos, axis=1)
            c = jnp.where(jnp.any(emitted_eos, axis=1),
                          jnp.minimum(c, first_eos + 1), c)
            c = jnp.minimum(c, max_new - n_emit)   # budget
            emit_ok = state.active & ~state.done
            c = jnp.where(emit_ok, jnp.maximum(c, 0), 0)
            hit = jnp.any((g == gen.eos_token_id)
                          & (koff[None, :] < c[:, None]), axis=1)

            emit = koff[None, :] < c[:, None]
            toks = jnp.where(emit, g, jnp.int32(gen.pad_token_id))
            hist_idx = jnp.where(
                emit, prompt_buf + n_emit[:, None] + koff[None, :], hist_len)
            hist = state.hist.at[rows[:, None], hist_idx].set(g, mode="drop")
            new_pending = jnp.where(
                c > 0,
                jnp.take_along_axis(
                    g, jnp.clip(c - 1, 0)[:, None], axis=1)[:, 0],
                pending)
            n_gen = state.n_gen + c
            newly_done = emit_ok & (hit | (n_gen + 1 >= max_new))
            # tokens + counts packed into one array = one host fetch per step
            packed = jnp.concatenate([toks, c[:, None]], axis=1)
            return SlotState(
                cache=cache, tok=new_pending, prompt_len=state.prompt_len,
                n_gen=n_gen, active=state.active,
                done=state.done | newly_done, hist=hist,
            ), packed

        return decode_fn

    return init_state, prefill_fn, make_decode


@dataclasses.dataclass
class _Request:
    rid: int
    embeds: Any              # (1, prompt_buf, E)
    prompt_len: int
    tokens: List[int] = dataclasses.field(default_factory=list)
    slot: Optional[int] = None
    finished: bool = False
    prompt_ids: Any = None   # (1, prompt_buf) int32; speculative drafting seed


class Engine:
    """Host-side continuous-batching scheduler over the slot pool.

    ``speculative=True`` (greedy only): each device step runs an n-gram-
    drafted verify block per slot and can emit up to ``block_len`` tokens —
    same tokens, ~acceptance× fewer host→device round trips.

    ``speculative="auto"``: adaptive speculation — acceptance is content-
    dependent (measured 1.1/step on random prompts vs 4.0 on template-heavy
    reports, BENCHMARKS.md) and a verify block's cost grows with its
    length, so the engine walks a LADDER of block sizes
    (1, 2, 4, ..., block_len — all sharing one compiled state layout):
    a sliding window of measured acceptance below ``spec_threshold`` steps
    one rung down (eventually to one-token dispatches), a window accepting
    >= ``grow_frac`` of the current block steps one rung up, and after
    ``probe_every`` one-token dispatches the engine re-probes the next
    rung. Output is bit-identical at every rung; only dispatch granularity
    adapts.

    Threshold defaults are CALIBRATED from the measured per-rung dispatch
    cost c(k) on the axon relay (docs/artifacts/r5/slot_ladder.json, 1.7B
    int8, 8 slots): c(k) is nearly flat — 33.9 / 37.6 / 35.5 / 40.2
    ms/dispatch at kb 1/2/4/8 (plain 35.3) — because the host→device round
    trip dominates the verify compute at slot scale. The worst cost ratio
    c(8)/c(1) = 1.19, so a rung pays for itself at acceptance ≈1.2, NOT
    the old guess of 2.0 (which would have demoted the measured-best rung:
    kb4 at acceptance 1.30 was the fastest row, 220 tok/s vs plain 204.5).
    ``grow_frac=0.55`` sets the promotion bound at 0.55·k; the shrink
    check runs first, so promotion from kb2 effectively requires a window
    ≥ ``spec_threshold`` (1.2 > 0.55·2) — deliberate: the measured kb2 row
    (200 tok/s at acceptance 1.18) LOST to kb1 (213), so the [1.1, 1.2)
    band demotes rather than grows — while 4→8 waits for acceptance ≥2.2
    (kb8 measured slower at 1.35: 194 tok/s vs kb4's 220).
    """

    def __init__(self, model, params, gen: GenerationConfig,
                 num_slots: int = 8, prompt_buf: int = 1024,
                 cache_dtype=jnp.bfloat16, seed: int = 0,
                 speculative=False, block_len: int = 8,
                 spec_threshold: float = 1.2, spec_window: int = 16,
                 probe_every: int = 64, grow_frac: float = 0.55):
        self.model = model
        self.params = params
        self.gen = gen
        self.num_slots = num_slots
        self.prompt_buf = prompt_buf
        self.adaptive = speculative == "auto"
        self.speculative = bool(speculative)
        if self.speculative:
            (init_state, self._prefill,
             self._make_decode) = make_spec_slot_fns(
                model, gen, num_slots, prompt_buf, cache_dtype, block_len)
            # block-size ladder: powers of two up to block_len; every rung
            # reuses the same slot state (cache slack is sized once for
            # block_len), so walking costs one extra compile per rung USED
            ladder = [1]
            while ladder[-1] * 2 < block_len:
                ladder.append(ladder[-1] * 2)
            if block_len > 1:
                ladder.append(block_len)
            self._kb_ladder = ladder
            self._decode_fns: Dict[int, Any] = {}
            # non-adaptive engines stay pinned at the top rung
            self._rung = len(ladder) - 1
        else:
            init_state, self._prefill, self._decode = make_slot_fns(
                model, gen, num_slots, prompt_buf, cache_dtype)
        self.state = init_state()
        self._rng = jax.random.PRNGKey(seed)
        self._queue: deque = deque()
        self._by_slot: Dict[int, _Request] = {}
        self._results: Dict[int, List[int]] = {}
        self._next_rid = 0
        # acceptance telemetry (speculative only): verify_steps counts one
        # per (active slot, decode dispatch); mean acceptance =
        # emitted_tokens / verify_steps
        self.spec_stats = {"emitted_tokens": 0, "verify_steps": 0}
        # adaptive-policy state
        self.spec_threshold = spec_threshold
        self.spec_window = spec_window
        self.probe_every = probe_every
        self.grow_frac = grow_frac
        self._accept_window: deque = deque(maxlen=spec_window)
        self._plain_dispatches = 0
        # engine telemetry: cumulative counters + a sliding window of
        # (monotonic time, cumulative emitted tokens) samples, one per
        # scheduler tick, for the live tokens/s rate
        self._emitted_total = 0
        self._completed = 0
        self._rate_window: deque = deque(maxlen=256)

    @property
    def spec_block_len(self) -> int:
        """Current verify-block size (1 = plain one-token dispatches)."""
        if not self.speculative:
            return 1
        return self._kb_ladder[self._rung]

    @property
    def spec_mode(self) -> str:
        """'spec' when dispatches carry drafted verify blocks, else
        'plain' (kb=1 rung or a non-speculative engine)."""
        return "spec" if self.spec_block_len > 1 else "plain"

    def _decode_for(self, kbx: int):
        """Jitted decode for one ladder rung, compiled on first use."""
        if kbx not in self._decode_fns:
            self._decode_fns[kbx] = self._make_decode(kbx)
        return self._decode_fns[kbx]

    def telemetry(self) -> Dict[str, Any]:
        """Live engine stats (served at GET /v1/config as ``engine``).
        ``tokens_per_s`` is measured over the last ≤10 s of scheduler
        ticks and reads 0 when the engine has been idle that long."""
        now = time.monotonic()
        recent = [(t, n) for t, n in self._rate_window if now - t <= 10.0]
        rate = 0.0
        if len(recent) >= 2 and recent[-1][0] > recent[0][0]:
            rate = ((recent[-1][1] - recent[0][1])
                    / (recent[-1][0] - recent[0][0]))
        return {
            "queue_depth": len(self._queue),
            "active_slots": len(self._by_slot),
            "num_slots": self.num_slots,
            "completed_requests": self._completed,
            "emitted_tokens_total": self._emitted_total,
            "tokens_per_s": round(rate, 1),
            "spec_block_len": self.spec_block_len,
        }

    def _adapt(self, emitted: int, slot_steps: int) -> None:
        """Walk the block-size ladder on a full acceptance window: below
        ``spec_threshold`` step one rung down (toward one-token
        dispatches); accepting >= ``grow_frac`` of the current block step
        one rung up (the content is template-heavy enough that a longer
        block would still mostly accept)."""
        self._accept_window.append((emitted, slot_steps))
        if len(self._accept_window) < self.spec_window:
            return
        tok = sum(e for e, _ in self._accept_window)
        stp = max(sum(s for _, s in self._accept_window), 1)
        accept = tok / stp
        if accept < self.spec_threshold and self._rung > 0:
            self._rung -= 1
            self._plain_dispatches = 0
            self._accept_window.clear()
        elif (accept >= self.grow_frac * self._kb_ladder[self._rung]
              and self._rung < len(self._kb_ladder) - 1):
            self._rung += 1
            self._accept_window.clear()

    def _next_rng(self):
        """Per-step PRNG key; greedy engines skip the device-side split
        (one fewer relay round trip per dispatch — the key is unused)."""
        if not self.gen.do_sample:
            return self._rng
        self._rng, sub = jax.random.split(self._rng)
        return sub

    # -- submission ---------------------------------------------------------

    def submit_embeds(self, embeds, prompt_len: int, prompt_ids=None) -> int:
        """Queue a request given (1, prompt_buf, E) prompt embeddings.
        ``prompt_ids`` seeds speculative drafting; without it the history
        match simply never fires on the prompt (still correct)."""
        rid = self._next_rid
        self._next_rid += 1
        self._queue.append(_Request(rid, embeds, prompt_len,
                                    prompt_ids=prompt_ids))
        return rid

    def submit(self, input_ids, images=None, question_ids=None) -> int:
        """Queue a request from ids (+ optional volume): embeds computed via
        the multimodal splice, right-padded to the prompt buffer."""
        ids = np.asarray(input_ids, np.int32).reshape(1, -1)
        prompt_len = ids.shape[1]
        padded = np.full((1, self.prompt_buf), self.gen.pad_token_id,
                         np.int32)
        padded[0, :prompt_len] = ids[0]
        if images is None and not hasattr(type(self.model),
                                          "prepare_inputs_embeds"):
            # bare text decoder (e.g. a GREEN judge served on the slot pool)
            embeds = self.model.apply(self.params, jnp.asarray(padded),
                                      method="embed_tokens")
        else:
            embeds = self.model.apply(
                self.params, jnp.asarray(padded), images, question_ids,
                method="prepare_inputs_embeds")
        return self.submit_embeds(embeds, prompt_len, jnp.asarray(padded))

    # -- scheduling ---------------------------------------------------------
    #
    # done/active are mirrored host-side (a request finishes exactly when
    # an appended token is EOS or it reaches max_new_tokens — both host-
    # visible events), so the scheduler never fetches device state: the
    # only per-step device->host transfer is the emitted-token array.
    # On the axon relay each fetch costs a full round trip, and this
    # halves-to-thirds the per-dispatch cost (BENCHMARKS.md).

    def _free_slots(self) -> List[int]:
        return [i for i in range(self.num_slots) if i not in self._by_slot]

    def _append(self, req: _Request, tok: int) -> None:
        req.tokens.append(tok)
        self._emitted_total += 1
        if tok == self.gen.eos_token_id or \
                len(req.tokens) >= self.gen.max_new_tokens:
            req.finished = True

    def _collect_finished(self):
        for slot, req in list(self._by_slot.items()):
            if req.finished:
                self._completed += 1
                self._results[req.rid] = req.tokens
                self.state = dataclasses.replace(
                    self.state,
                    active=self.state.active.at[slot].set(False),
                    done=self.state.done.at[slot].set(False))
                del self._by_slot[slot]

    def step(self) -> bool:
        """One scheduler tick; returns False when fully idle."""
        self._rate_window.append((time.monotonic(), self._emitted_total))
        self._collect_finished()
        free = self._free_slots()
        if self._queue and free:
            slot = free[0]
            req = self._queue.popleft()
            sub = self._next_rng()
            if self.speculative:
                ids = req.prompt_ids
                if ids is None:  # no drafting seed: sentinel row
                    ids = jnp.full((1, self.prompt_buf), -1, jnp.int32)
                self.state, tok0 = self._prefill(
                    self.params, self.state, req.embeds, ids,
                    jnp.int32(req.prompt_len), jnp.int32(slot), sub)
            else:
                self.state, tok0 = self._prefill(
                    self.params, self.state, req.embeds,
                    jnp.int32(req.prompt_len), jnp.int32(slot), sub)
            req.slot = slot
            self._append(req, int(tok0))
            self._by_slot[slot] = req
            self._collect_finished()
            return True
        if self._by_slot:
            sub = self._next_rng()
            if self.speculative:
                kb_cur = self.spec_block_len
                if self.adaptive and kb_cur == 1:
                    # plain rung: kb=1 verify block on the same state;
                    # periodically climb one rung to re-probe speculation
                    self._plain_dispatches += 1
                    if self._plain_dispatches >= self.probe_every:
                        self._rung = min(self._rung + 1,
                                         len(self._kb_ladder) - 1)
                        self._plain_dispatches = 0
                        self._accept_window.clear()
                fn = self._decode_for(kb_cur)
                # one fetch: (S, K) tokens packed with the (S,) counts
                self.state, packed = fn(self.params, self.state, sub)
                packed = np.asarray(packed)
                toks, counts = packed[:, :-1], packed[:, -1]
                emitted = slot_steps = 0
                for slot, req in self._by_slot.items():
                    room = self.gen.max_new_tokens - len(req.tokens)
                    slot_steps += 1
                    for t in toks[slot][: min(int(counts[slot]), room)]:
                        if req.finished:
                            break
                        self._append(req, int(t))
                        emitted += 1
                self.spec_stats["verify_steps"] += slot_steps
                self.spec_stats["emitted_tokens"] += emitted
                if self.adaptive and kb_cur > 1:
                    self._adapt(emitted, slot_steps)
            else:
                self.state, toks = self._decode(self.params, self.state, sub)
                toks = np.asarray(toks)
                # every tracked slot had done=False before this step
                # (finished rows are collected first), so all emitted
                # tokens are real
                for slot, req in self._by_slot.items():
                    self._append(req, int(toks[slot]))
            self._collect_finished()
            return True
        return bool(self._queue)

    def run(self) -> Dict[int, List[int]]:
        """Drive until every submitted request completes; returns
        rid -> generated token list."""
        while self._queue or self._by_slot:
            self.step()
        return dict(self._results)

    def abort_all(self) -> List[int]:
        """Drop every queued and in-flight request and free their slots;
        returns the affected rids. Completed results in ``_results`` are
        preserved. Used by the serving driver to recover from a step
        failure without restarting the engine."""
        rids = ([r.rid for r in self._queue]
                + [r.rid for r in self._by_slot.values()])
        self._queue.clear()
        for slot in list(self._by_slot):
            self.state = dataclasses.replace(
                self.state,
                active=self.state.active.at[slot].set(False),
                done=self.state.done.at[slot].set(False))
            del self._by_slot[slot]
        return rids


class EngineInference:
    """Thread-safe, concurrent drop-in for eval.inference.U2InferenceModel:
    many callers' .inference() requests share the slot pool concurrently
    (a background driver thread owns the Engine; callers block only on their
    own request). Serving layer: pass to serve.U2Server — it advertises
    ``concurrent = True`` so the server skips its global generation lock.
    """

    concurrent = True

    def __init__(self, model, params, tokenizer, cfg,
                 max_new_tokens: int = 768, do_sample: bool = False,
                 top_p: float = 0.9, num_slots: int = 8,
                 prompt_buf: int = 1024, cache_dtype=jnp.bfloat16,
                 question_len: int = 64, speculative: Optional[bool] = None,
                 block_len: int = 8):
        import queue
        import threading

        self.cfg = cfg
        self.tokenizer = tokenizer
        self.question_len = question_len
        self.gen_cfg = GenerationConfig(
            max_new_tokens=max_new_tokens, do_sample=do_sample, top_p=top_p,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id or 0)
        if speculative is None:
            # Opt-in: the calibrated per-rung dispatch costs are nearly
            # flat (c(k)/c(1) ≤ 1.19, break-even acceptance ≈1.2 —
            # docs/artifacts/r5/slot_ladder.json), but on random-prompt
            # content the adaptive ladder measured 200 tok/s vs plain's
            # 204.5 (acceptance 1.14 < break-even), so plain stays the
            # default for arbitrary chat; template-heavy reports measure
            # acceptance ≥1.3 (kb4: 220 tok/s) — flip on ("auto") for
            # report-serving workloads. Tokens are identical either way.
            speculative = False
        if speculative and do_sample:
            speculative = False  # the slot verify block is greedy-only
        self.engine = Engine(model, params, self.gen_cfg,
                             num_slots=num_slots, prompt_buf=prompt_buf,
                             cache_dtype=cache_dtype,
                             speculative=speculative, block_len=block_len)
        self._submit_q: "queue.Queue" = queue.Queue()
        self._cv = threading.Condition()
        self._results: Dict[int, List[int]] = {}
        self._errors: Dict[int, str] = {}      # local -> failure message
        self._pending_map: Dict[int, int] = {}
        self._streams: Dict[int, "queue.Queue"] = {}  # local -> token queue
        self._sent: Dict[int, int] = {}               # rid -> tokens pushed
        self._next_local = 0
        self._lock = threading.Lock()
        self._thread = threading.Thread(target=self._drive, daemon=True)
        self._thread.start()

    @property
    def speculative(self) -> bool:
        return self.engine.speculative

    @property
    def spec_stats(self) -> Dict[str, int]:
        return self.engine.spec_stats

    @property
    def spec_mode(self) -> str:
        return self.engine.spec_mode

    @property
    def spec_block_len(self) -> int:
        return self.engine.spec_block_len

    @property
    def telemetry(self) -> Dict[str, Any]:
        t = self.engine.telemetry()
        t["pending_submits"] = self._submit_q.qsize()
        return t

    def _push_stream(self, local: int, tokens: List[int], start: int,
                     done: bool):
        q = self._streams.get(local)
        if q is None:
            return
        for t in tokens[start:]:
            q.put(int(t))
        if done:
            q.put(None)
            self._streams.pop(local, None)

    def _fail_local(self, local: int, msg: str) -> None:
        """Deliver a failure to one caller: wakes a blocked inference()
        (which raises) and terminates its stream if it was streaming."""
        with self._cv:
            self._errors[local] = msg
            self._cv.notify_all()
        q = self._streams.pop(local, None)
        if q is not None:
            q.put(None)

    def _drive(self):
        import queue
        import time as _time
        import traceback

        while True:
            moved = False
            try:
                while True:
                    local, ids, images, qids = self._submit_q.get_nowait()
                    moved = True
                    try:
                        rid = self.engine.submit(ids, images, qids)
                    except Exception as e:  # noqa: BLE001 — one bad request
                        # must not kill the driver thread; fail that caller
                        self._fail_local(local, f"{type(e).__name__}: {e}")
                    else:
                        self._pending_map[rid] = local
            except queue.Empty:
                pass
            if self.engine._queue or self.engine._by_slot:
                moved = True
                try:
                    self.engine.step()
                    # incremental token delivery for streaming callers
                    for slot, req in list(self.engine._by_slot.items()):
                        local = self._pending_map.get(req.rid)
                        if local is not None and local in self._streams:
                            sent = self._sent.get(req.rid, 0)
                            self._push_stream(local, req.tokens, sent, False)
                            self._sent[req.rid] = len(req.tokens)
                    if self.engine._results:
                        with self._cv:
                            for rid in list(self.engine._results):
                                local = self._pending_map.pop(rid)
                                toks = self.engine._results.pop(rid)
                                if local in self._streams:
                                    self._push_stream(
                                        local, toks,
                                        self._sent.pop(rid, 0), True)
                                else:
                                    self._results[local] = toks
                            self._cv.notify_all()
                except Exception as e:  # noqa: BLE001
                    # a step failure poisons every in-flight request but
                    # must not kill the driver: abort them with the error,
                    # free the slots, keep serving new submissions
                    traceback.print_exc()
                    for rid in self.engine.abort_all():
                        lcl = self._pending_map.pop(rid, None)
                        self._sent.pop(rid, None)
                        if lcl is not None:
                            self._fail_local(
                                lcl, f"{type(e).__name__}: {e}")
            if not moved:
                _time.sleep(0.002)

    def _encode_prompt(self, question: str, with_image: bool):
        prompt = question
        if with_image:
            prompt = "<im_patch>" * self.cfg.proj_out_num + question
        ids = self.tokenizer(prompt, add_special_tokens=False)["input_ids"]
        ids = ids[: self.engine.prompt_buf]
        q = self.tokenizer(question,
                           add_special_tokens=False)["input_ids"]
        qids = np.full((1, self.question_len), self.gen_cfg.pad_token_id,
                       np.int32)
        qids[0, : len(q[: self.question_len])] = q[: self.question_len]
        return np.asarray(ids, np.int32)[None], qids

    def _submit_local(self, image, question: str, stream: bool) -> int:
        import queue

        with_image = image is not None
        images = None
        if with_image:
            arr = np.asarray(image)
            expected = (self.cfg.num_chunks, *self.cfg.vision.input_spatial)
            if tuple(arr.shape) != expected:
                # reject in the caller's thread with an actionable message
                # (a bad shape must never reach the engine thread)
                raise ValueError(
                    f"volume shape {tuple(arr.shape)} does not match the "
                    f"model's chunk geometry {expected}; preprocess with "
                    "U2VolumeTransform (serve handles .nii/.nii.gz "
                    "automatically; .npy must already be chunked)")
            images = jnp.asarray(arr[None], jnp.float32)
        ids, qids = self._encode_prompt(question, with_image)
        with self._lock:
            local = self._next_local
            self._next_local += 1
            if stream:
                self._streams[local] = queue.Queue()
        self._submit_q.put((local, ids, images,
                            jnp.asarray(qids) if with_image else None))
        return local

    def inference(self, image, question: str) -> str:
        """Blocking per-caller; concurrent across callers."""
        local = self._submit_local(image, question, stream=False)
        with self._cv:
            while local not in self._results and local not in self._errors:
                self._cv.wait(timeout=1.0)
            if local in self._errors:
                raise RuntimeError(self._errors.pop(local))
            toks = self._results.pop(local)
        keep = [t for t in toks if t not in (self.gen_cfg.pad_token_id,
                                             self.gen_cfg.eos_token_id)]
        return self.tokenizer.decode(keep, skip_special_tokens=True).strip()

    def inference_stream(self, image, question: str):
        """Generator of text deltas as the slot pool decodes this request
        (serve.py SSE endpoints). Deltas concatenate to inference()'s
        output up to leading/trailing whitespace."""
        local = self._submit_local(image, question, stream=True)
        q = self._streams[local]
        toks: List[int] = []
        prev = ""
        skip = (self.gen_cfg.pad_token_id, self.gen_cfg.eos_token_id)
        while True:
            t = q.get()
            if t is None:
                with self._cv:
                    err = self._errors.pop(local, None)
                if err is not None:
                    raise RuntimeError(err)
                break
            if t in skip:
                continue
            toks.append(t)
            # re-decode the full prefix each time: multi-byte/merged tokens
            # may retroactively change earlier text, so only emit stable
            # extensions of what was already sent
            text = self.tokenizer.decode(toks, skip_special_tokens=True)
            if text.startswith(prev) and len(text) > len(prev):
                yield text[len(prev):]
                prev = text
        text = self.tokenizer.decode(toks, skip_special_tokens=True)
        if text.startswith(prev) and len(text) > len(prev):
            yield text[len(prev):]
