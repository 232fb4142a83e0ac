"""Continuous-batching engine: slot outputs must equal per-request generate.

The engine interleaves prefills and decodes over a shared slot pool; since
every row's attention/cache math is row-independent, each request's greedy
tokens must match the plain single-request generate exactly — including
requests admitted mid-flight while other slots are decoding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from u2tokenizer_tpu.config import GenerationConfig, U2ModelConfig
from u2tokenizer_tpu.models.generate import make_multimodal_generate_fn
from u2tokenizer_tpu.models.slot_serving import Engine
from u2tokenizer_tpu.models.u2_model import U2CausalLM

MAX_NEW = 6
PROMPT_BUF = 24


@pytest.fixture(scope="module")
def setup():
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    d, h, w = cfg.vision.input_spatial
    img = jax.random.normal(rng, (1, cfg.num_chunks, d, h, w))
    qids = jnp.ones((1, 4), jnp.int32)
    params = model.init(rng, jnp.zeros((1, PROMPT_BUF), jnp.int32), img, qids)
    gen = GenerationConfig(max_new_tokens=MAX_NEW, do_sample=False,
                           eos_token_id=-2, pad_token_id=0)
    requests = []
    for i, plen in enumerate([10, 7, 13, 5, 11]):
        ids = np.asarray(jax.random.randint(
            jax.random.PRNGKey(10 + i), (1, plen), 1, cfg.llm.vocab_size))
        use_img = i % 2 == 0
        requests.append((ids, img if use_img else None,
                         qids if use_img else None))
    return cfg, model, params, gen, requests


def _reference_tokens(model, params, gen, ids, images, qids):
    padded = np.zeros((1, PROMPT_BUF), np.int32)
    padded[0, : ids.shape[1]] = ids[0]
    gen_fn = make_multimodal_generate_fn(model, gen, cache_dtype=jnp.float32,
                                         jit=False)
    toks = gen_fn(params, jnp.asarray(padded), images, qids,
                  jnp.asarray([ids.shape[1]], jnp.int32),
                  jax.random.PRNGKey(0))
    return [int(t) for t in np.asarray(toks)[0]]


def test_engine_matches_single_request_generate(setup):
    cfg, model, params, gen, requests = setup
    engine = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                    cache_dtype=jnp.float32)
    rids = [engine.submit(ids, images, qids)
            for ids, images, qids in requests]
    # 5 requests over 2 slots forces mid-flight admissions
    results = engine.run()
    assert set(results) == set(rids)
    for rid, (ids, images, qids) in zip(rids, requests):
        ref = _reference_tokens(model, params, gen, ids, images, qids)
        assert results[rid] == ref, (rid, results[rid], ref)


def test_engine_slot_reuse_and_int8(setup):
    cfg, model, params, gen, requests = setup
    engine = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                    cache_dtype="int8")
    ids, images, qids = requests[0]
    r1 = engine.submit(ids, images, qids)
    out1 = engine.run()
    # the freed slot serves a second wave
    r2 = engine.submit(*requests[1])
    r3 = engine.submit(*requests[2])
    out2 = engine.run()
    assert len(out1[r1]) == MAX_NEW
    assert len(out2[r2]) == MAX_NEW and len(out2[r3]) == MAX_NEW


def test_engine_inference_concurrent_callers(setup):
    """EngineInference: concurrent threads share the slot pool and each gets
    the same tokens a single-request generate would produce."""
    import threading

    from test_data import MockTokenizer

    from u2tokenizer_tpu.models.slot_serving import EngineInference

    cfg, model, params, gen, requests = setup
    tok = MockTokenizer()
    inf = EngineInference(model, params, tok, cfg, max_new_tokens=MAX_NEW,
                          num_slots=2, prompt_buf=PROMPT_BUF,
                          cache_dtype=jnp.float32, question_len=4)
    d, h, w = cfg.vision.input_spatial
    rng = np.random.default_rng(0)
    vols = [rng.normal(size=(cfg.num_chunks, d, h, w)).astype(np.float32)
            for _ in range(3)]
    questions = [f"describe finding number {i}" for i in range(3)]

    results = {}
    def call(i):
        results[i] = inf.inference(vols[i], questions[i])

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert set(results) == {0, 1, 2}
    assert all(isinstance(v, str) for v in results.values())

    # match the sequential single-request path exactly (greedy)
    for i in range(3):
        ids, qids = inf._encode_prompt(questions[i], True)
        ref = _reference_tokens(
            model, params, gen, ids,
            jnp.asarray(vols[i][None], jnp.float32), jnp.asarray(qids))
        keep = [t for t in ref if t not in (gen.pad_token_id,
                                            tok.eos_token_id)]
        expect = tok.decode(keep, skip_special_tokens=True).strip()
        assert results[i] == expect, (i, results[i], expect)


def test_engine_inference_stream_matches(setup):
    """inference_stream deltas concatenate to the blocking inference text."""
    from test_data import MockTokenizer

    from u2tokenizer_tpu.models.slot_serving import EngineInference

    cfg, model, params, gen, requests = setup
    tok = MockTokenizer()
    inf = EngineInference(model, params, tok, cfg, max_new_tokens=MAX_NEW,
                          num_slots=2, prompt_buf=PROMPT_BUF,
                          cache_dtype=jnp.float32, question_len=4)
    d, h, w = cfg.vision.input_spatial
    vol = np.random.default_rng(1).normal(
        size=(cfg.num_chunks, d, h, w)).astype(np.float32)
    question = "describe the streamed finding"
    deltas = list(inf.inference_stream(vol, question))
    assert len(deltas) >= 1
    streamed = "".join(deltas)
    blocking = inf.inference(vol, question)
    assert streamed.strip() == blocking


@pytest.mark.slow  # 8-device virtual-mesh sharded serving
def test_engine_tensor_parallel_matches(setup):
    """Multi-chip serving: the slot engine with TP/FSDP-sharded params on
    the virtual mesh produces the same tokens as the unsharded engine — the
    pooled KV cache and decode collectives are laid out by XLA from the
    param placements."""
    from u2tokenizer_tpu.config import MeshConfig
    from u2tokenizer_tpu.parallel.mesh import make_mesh, param_shardings

    cfg, model, params, gen, requests = setup
    ref_engine = Engine(model, params, gen, num_slots=2,
                        prompt_buf=PROMPT_BUF, cache_dtype=jnp.float32)
    rids = [ref_engine.submit(*requests[i]) for i in range(3)]
    ref = ref_engine.run()

    mesh = make_mesh(MeshConfig(data=1, fsdp=2, tensor=4))
    sharded = jax.device_put(params, param_shardings(mesh, params))
    tp_engine = Engine(model, sharded, gen, num_slots=2,
                       prompt_buf=PROMPT_BUF, cache_dtype=jnp.float32)
    rids2 = [tp_engine.submit(*requests[i]) for i in range(3)]
    out = tp_engine.run()
    for a, b in zip(rids, rids2):
        assert ref[a] == out[b], (ref[a], out[b])


def test_spec_engine_matches_plain_engine(setup):
    """Speculative slot engine: same tokens as the plain engine (greedy),
    including mid-flight admissions and per-slot divergent acceptance."""
    cfg, model, params, gen, requests = setup
    plain = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                   cache_dtype=jnp.float32)
    rids_p = [plain.submit(*requests[i]) for i in range(5)]
    ref = plain.run()

    spec = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                  cache_dtype=jnp.float32, speculative=True, block_len=4)
    rids_s = [spec.submit(*requests[i]) for i in range(5)]
    out = spec.run()
    for a, b in zip(rids_p, rids_s):
        assert ref[a] == out[b], (ref[a], out[b])


def test_spec_engine_int8_cache(setup):
    cfg, model, params, gen, requests = setup
    plain = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                   cache_dtype="int8")
    r_p = plain.submit(*requests[0])
    ref = plain.run()
    spec = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                  cache_dtype="int8", speculative=True, block_len=4)
    r_s = spec.submit(*requests[0])
    out = spec.run()
    assert ref[r_p] == out[r_s]


def test_adaptive_engine_matches_plain_and_flips_modes(setup):
    """speculative="auto": tokens identical to the plain engine while the
    policy flips spec -> plain (threshold unreachable) and probes back."""
    cfg, model, params, gen, requests = setup
    plain = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                   cache_dtype=jnp.float32)
    rids_p = [plain.submit(*requests[i]) for i in range(5)]
    ref = plain.run()

    # threshold above block_len makes every full window flip to plain;
    # tiny window + probe_every force several mode transitions per run
    auto = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                  cache_dtype=jnp.float32, speculative="auto", block_len=4,
                  spec_threshold=5.0, spec_window=2, probe_every=3)
    assert auto.adaptive and auto.speculative and auto.spec_mode == "spec"
    modes = []
    rids_a = [auto.submit(*requests[i]) for i in range(5)]
    while auto._queue or auto._by_slot:
        auto.step()
        modes.append(auto.spec_mode)
    out = auto._results
    for a, b in zip(rids_p, rids_a):
        assert ref[a] == out[b], (ref[a], out[b])
    assert "plain" in modes, "policy never fell back"
    # probe_every plain dispatches must re-enter spec at least once
    flips = sum(1 for x, y in zip(modes, modes[1:]) if x != y)
    assert flips >= 2, modes


def test_adaptive_engine_stays_spec_on_high_acceptance(setup):
    """With threshold 1.0 (always satisfiable: every verify step emits >= 1)
    the adaptive engine never leaves spec mode."""
    cfg, model, params, gen, requests = setup
    auto = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                  cache_dtype=jnp.float32, speculative="auto", block_len=4,
                  spec_threshold=1.0, spec_window=2, probe_every=3)
    auto.submit(*requests[0])
    while auto._queue or auto._by_slot:
        auto.step()
        assert auto.spec_mode == "spec"


def test_adaptive_engine_walks_block_ladder_down(setup):
    """An unreachable threshold walks the ladder 4 -> 2 -> 1 one rung per
    full window (not a binary flip to plain), with tokens still identical
    to the plain engine."""
    cfg, model, params, gen, requests = setup
    plain = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                   cache_dtype=jnp.float32)
    rids_p = [plain.submit(*requests[i]) for i in range(5)]
    ref = plain.run()

    auto = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                  cache_dtype=jnp.float32, speculative="auto", block_len=4,
                  spec_threshold=5.0, spec_window=2, probe_every=100)
    assert auto._kb_ladder == [1, 2, 4] and auto.spec_block_len == 4
    sizes = []
    rids_a = [auto.submit(*requests[i]) for i in range(5)]
    while auto._queue or auto._by_slot:
        auto.step()
        sizes.append(auto.spec_block_len)
    for a, b in zip(rids_p, rids_a):
        assert ref[a] == auto._results[b], (ref[a], auto._results[b])
    # the intermediate rung must be visited on the way down
    assert 2 in sizes and 1 in sizes, sizes
    assert sizes.index(2) < sizes.index(1), sizes


def test_adaptive_engine_climbs_ladder_on_acceptance(setup):
    """From the kb=1 rung, probe_every dispatches climb one rung, and a
    window accepting >= grow_frac * kb climbs further (grow_frac=0 makes
    every full window climb) — up to the top rung."""
    cfg, model, params, gen, requests = setup
    auto = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                  cache_dtype=jnp.float32, speculative="auto", block_len=4,
                  spec_threshold=0.0, spec_window=1, probe_every=2,
                  grow_frac=0.0)
    auto._rung = 0  # start pinned at one-token dispatches
    sizes = []
    for i in range(5):
        auto.submit(*requests[i])
    while auto._queue or auto._by_slot:
        auto.step()
        sizes.append(auto.spec_block_len)
    assert 4 in sizes, sizes  # climbed 1 -> 2 -> 4
    ref = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                 cache_dtype=jnp.float32)
    rids = [ref.submit(*requests[i]) for i in range(5)]
    out = ref.run()
    for rid, (_, toks) in zip(rids, sorted(auto._results.items())):
        assert out[rid] == toks


def test_engine_inference_rejects_bad_volume_shape(setup):
    """A mis-shaped volume raises in the caller's thread with an actionable
    message and never reaches the engine; the pool keeps serving."""
    from test_data import MockTokenizer

    from u2tokenizer_tpu.models.slot_serving import EngineInference

    cfg, model, params, gen, requests = setup
    inf = EngineInference(model, params, MockTokenizer(), cfg,
                          max_new_tokens=MAX_NEW, num_slots=2,
                          prompt_buf=PROMPT_BUF, cache_dtype=jnp.float32,
                          question_len=4)
    bad = np.zeros((32, 128, 128), np.float32)  # un-chunked raw volume
    with pytest.raises(ValueError, match="chunk geometry"):
        inf.inference(bad, "describe")
    d, h, w = cfg.vision.input_spatial
    good = np.zeros((cfg.num_chunks, d, h, w), np.float32)
    assert isinstance(inf.inference(good, "describe"), str)


def test_engine_driver_survives_failures(setup):
    """Engine-thread failures (submit or step) must fail the affected
    callers with RuntimeError — not hang them or kill the driver thread —
    and the engine must keep serving afterwards."""
    from test_data import MockTokenizer

    from u2tokenizer_tpu.models.slot_serving import EngineInference

    cfg, model, params, gen, requests = setup
    inf = EngineInference(model, params, MockTokenizer(), cfg,
                          max_new_tokens=MAX_NEW, num_slots=2,
                          prompt_buf=PROMPT_BUF, cache_dtype=jnp.float32,
                          question_len=4)
    d, h, w = cfg.vision.input_spatial
    vol = np.zeros((cfg.num_chunks, d, h, w), np.float32)

    # 1. submit() raising inside the driver fails only that caller
    orig_submit = inf.engine.submit
    def boom_submit(*a, **k):
        inf.engine.submit = orig_submit
        raise RuntimeError("device lost during submit")
    inf.engine.submit = boom_submit
    with pytest.raises(RuntimeError, match="device lost during submit"):
        inf.inference(vol, "q0")
    assert isinstance(inf.inference(vol, "q1"), str)

    # 2. step() raising mid-decode aborts in-flight requests with the error
    #    and frees their slots for later traffic
    orig_step = inf.engine.step
    calls = {"n": 0}
    def boom_step():
        calls["n"] += 1
        if calls["n"] == 2:  # let the prefill land, then blow up a decode
            inf.engine.step = orig_step
            raise RuntimeError("XlaRuntimeError: device halted")
        return orig_step()
    inf.engine.step = boom_step
    with pytest.raises(RuntimeError, match="device halted"):
        inf.inference(vol, "q2")
    # stream variant after recovery still works end to end
    assert "".join(inf.inference_stream(vol, "q3")) != ""
    tele = inf.telemetry
    assert tele["active_slots"] == 0 and tele["queue_depth"] == 0


def test_engine_telemetry(setup):
    """telemetry() tracks queue depth / active slots / counters live and
    tokens_per_s decays to 0 when idle."""
    cfg, model, params, gen, requests = setup
    engine = Engine(model, params, gen, num_slots=2, prompt_buf=PROMPT_BUF,
                    cache_dtype=jnp.float32)
    t0 = engine.telemetry()
    assert t0 == {"queue_depth": 0, "active_slots": 0, "num_slots": 2,
                  "completed_requests": 0, "emitted_tokens_total": 0,
                  "tokens_per_s": 0.0, "spec_block_len": 1}
    for i in range(3):
        engine.submit(*requests[i])
    assert engine.telemetry()["queue_depth"] == 3
    engine.step()  # admit one
    t1 = engine.telemetry()
    assert t1["active_slots"] == 1 and t1["queue_depth"] == 2
    assert t1["emitted_tokens_total"] == 1  # prefill emits the first token
    saw_rate = False
    while engine._queue or engine._by_slot:
        engine.step()
        saw_rate = saw_rate or engine.telemetry()["tokens_per_s"] > 0
    tf = engine.telemetry()
    assert tf["completed_requests"] == 3
    assert tf["emitted_tokens_total"] == 3 * MAX_NEW
    assert tf["active_slots"] == 0 and tf["queue_depth"] == 0
    assert saw_rate, "tokens_per_s never went positive while decoding"


def test_engine_telemetry_over_http(setup):
    """/v1/config carries the live engine telemetry (queue depth,
    tokens/s, pending submits) for a continuous-batching server —
    the web demo's online_demo.py-parity status readout."""
    import json
    import threading
    import urllib.request
    from http.server import ThreadingHTTPServer

    from test_data import MockTokenizer

    from u2tokenizer_tpu.models.slot_serving import EngineInference
    from u2tokenizer_tpu.serve import U2Server, make_handler

    cfg, model, params, gen, requests = setup
    inf = EngineInference(model, params, MockTokenizer(), cfg,
                          max_new_tokens=MAX_NEW, num_slots=2,
                          prompt_buf=PROMPT_BUF, cache_dtype=jnp.float32,
                          question_len=4)
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(U2Server(inf, transform=False)))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/v1/config"
        with urllib.request.urlopen(url, timeout=60) as resp:
            payload = json.loads(resp.read())
        assert payload["concurrent"] is True
        tele = payload["engine"]
        assert tele["num_slots"] == 2
        assert tele["queue_depth"] == 0 and tele["active_slots"] == 0
        assert {"tokens_per_s", "completed_requests", "pending_submits",
                "emitted_tokens_total"} <= set(tele)
    finally:
        httpd.shutdown()
