"""Serving layer tests: real HTTP requests against a background server."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from test_data import MockTokenizer


@pytest.fixture(scope="module")
def server_url(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from u2tokenizer_tpu.config import U2ModelConfig
    from u2tokenizer_tpu.data.nifti import write_nifti
    from u2tokenizer_tpu.data.transforms import U2VolumeTransform
    from u2tokenizer_tpu.eval.inference import U2InferenceModel
    from u2tokenizer_tpu.models.hf_export import save_hf_checkpoint
    from u2tokenizer_tpu.models.u2_model import U2CausalLM
    from u2tokenizer_tpu.serve import serve_background

    tmp = tmp_path_factory.mktemp("serve")
    cfg = U2ModelConfig.tiny()
    model = U2CausalLM(cfg, dtype=jnp.float32)
    d, h, w = cfg.vision.input_spatial
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 16), jnp.int32),
                        jax.random.normal(rng, (1, cfg.num_chunks, d, h, w)),
                        jnp.ones((1, 4), jnp.int32))
    ckpt = str(tmp / "ckpt")
    save_hf_checkpoint(ckpt, params, cfg)

    # sampled serving is the reference's mode (lu2_model.py:63 top-p 0.9)
    # and the mode whose speculative default is measurement-justified
    wrapper = U2InferenceModel(ckpt, tokenizer=MockTokenizer(),
                               model_config=cfg, dtype=jnp.float32,
                               max_length=32, max_new_tokens=4,
                               do_sample=True)
    transform = U2VolumeTransform(data_type="validation", target_size=h,
                                  chunk_depth=d, num_chunks=cfg.num_chunks)
    httpd = serve_background(wrapper, port=0, transform=transform)
    port = httpd.server_address[1]

    vol_path = str(tmp / "case.nii.gz")
    write_nifti(vol_path, np.random.default_rng(0)
                .uniform(-100, 400, (24, 28, 12)).astype(np.float32))
    yield f"http://127.0.0.1:{port}", vol_path
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        return resp.status, json.loads(resp.read())


def test_health(server_url):
    url, _ = server_url
    with urllib.request.urlopen(url + "/health") as resp:
        assert json.loads(resp.read())["status"] == "ok"


def test_report_endpoint(server_url):
    url, vol = server_url
    status, out = _post(url + "/v1/report",
                        {"image_path": vol, "question": "describe findings"})
    assert status == 200
    assert "report" in out and isinstance(out["report"], str)
    assert out["latency_s"] >= 0


def test_report_bad_requests(server_url):
    url, vol = server_url
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/v1/report", {"question": "no image"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/v1/report", {"image_path": "/missing.nii.gz",
                                   "question": "q"})
    assert e.value.code in (404, 500)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(url + "/v1/nothing", {})
    assert e.value.code == 404


@pytest.fixture(scope="module")
def llm_server_url():
    """Text-only OpenAI-protocol server over a tiny CausalLM
    (start_vllm_server.py parity, serve.TextLMServer)."""
    import jax
    import jax.numpy as jnp

    from u2tokenizer_tpu.config import LLMConfig
    from u2tokenizer_tpu.models.llm.decoder import CausalLM
    from u2tokenizer_tpu.serve import TextLMServer, U2Server, make_handler
    from http.server import ThreadingHTTPServer
    import threading

    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    emb = jnp.zeros((1, 8, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb, jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 1, 8, 8), bool))
    lm = TextLMServer(model, params, MockTokenizer(), max_new_tokens=4,
                      max_length=32, name="tiny-test-llm")
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(U2Server(lm, transform=False)))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_llm_server_openai_protocol(llm_server_url):
    status, out = _post(llm_server_url + "/v1/completions",
                        {"prompt": "describe the findings"})
    assert status == 200
    assert isinstance(out["choices"][0]["text"], str)

    status, out = _post(llm_server_url + "/v1/chat/completions",
                        {"messages": [{"role": "user", "content": "hi"}]})
    assert status == 200
    assert out["choices"][0]["message"]["role"] == "assistant"

    with urllib.request.urlopen(llm_server_url + "/v1/models",
                                timeout=60) as resp:
        models = json.loads(resp.read())
    assert models["data"][0]["id"] == "tiny-test-llm"


def test_llm_server_n_choices(llm_server_url):
    """OpenAI ``n``: n choices come back with distinct indices; the greedy
    server's choices are identical (one decode, copied)."""
    status, out = _post(llm_server_url + "/v1/chat/completions",
                        {"messages": [{"role": "user", "content": "hi"}],
                         "n": 3})
    assert status == 200
    assert [c["index"] for c in out["choices"]] == [0, 1, 2]
    texts = [c["message"]["content"] for c in out["choices"]]
    assert texts[0] == texts[1] == texts[2]  # greedy server

    # stream + n>1 is rejected, not silently truncated
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(llm_server_url + "/v1/completions",
              {"prompt": "x", "n": 2, "stream": True})
    assert exc.value.code == 400

    # n above the bound is refused on BOTH endpoints (each distinct n
    # jit-compiles a fan-out decode kept in cache forever)
    for path, payload in (
            ("/v1/chat/completions",
             {"messages": [{"role": "user", "content": "x"}], "n": 99}),
            ("/v1/completions", {"prompt": "x", "n": 99})):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(llm_server_url + path, payload)
        assert exc.value.code == 400


def test_llm_server_sampled_n_fanout():
    """A sampled TextLMServer decodes n choices in one fan-out call; the
    choices differ (tiny random model => near-uniform logits)."""
    import jax
    import jax.numpy as jnp

    from u2tokenizer_tpu.config import LLMConfig
    from u2tokenizer_tpu.models.llm.decoder import CausalLM
    from u2tokenizer_tpu.serve import TextLMServer

    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    emb = jnp.zeros((1, 8, cfg.hidden_size), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), emb,
                        jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 1, 8, 8), bool))
    class IdTok(MockTokenizer):
        # decode to raw ids — MockTokenizer maps every generated (random)
        # id to "<unk>", hiding the row differences this test asserts
        def decode(self, ids, skip_special_tokens=True):
            return " ".join(str(int(i)) for i in ids)

    lm = TextLMServer(model, params, IdTok(), max_new_tokens=6,
                      max_length=32, do_sample=True, top_p=0.95,
                      speculative=False)
    texts = lm.text_completion_n("describe the findings", 4)
    assert len(texts) == 4
    assert len(set(texts)) > 1


def test_llm_server_spec_acceptance_telemetry(llm_server_url):
    """Greedy TextLMServer rides speculative decoding by default and its
    acceptance telemetry surfaces via /v1/config (roadmap QoL item)."""
    status, _ = _post(llm_server_url + "/v1/completions",
                      {"prompt": "count to four"})
    assert status == 200
    with urllib.request.urlopen(llm_server_url + "/v1/config",
                                timeout=60) as resp:
        cfg = json.loads(resp.read())
    assert cfg["speculative"] is True
    stats = cfg["spec_stats"]
    assert stats["verify_steps"] >= 1
    assert stats["emitted_tokens"] >= 1
    assert stats["mean_accept_per_step"] == pytest.approx(
        stats["emitted_tokens"] / stats["verify_steps"], abs=0.01)


def test_slot_engine_spec_stats():
    """Engine.spec_stats counts (slot, dispatch) verify steps and emitted
    tokens; plain engines leave it zeroed."""
    import jax
    import jax.numpy as jnp

    from u2tokenizer_tpu.config import GenerationConfig, LLMConfig
    from u2tokenizer_tpu.models.llm.decoder import CausalLM
    from u2tokenizer_tpu.models.slot_serving import Engine

    cfg = LLMConfig.tiny()
    model = CausalLM(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    emb = jnp.zeros((1, 8, cfg.hidden_size), jnp.float32)
    params = model.init(rng, emb, jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 1, 8, 8), bool))
    gen = GenerationConfig(max_new_tokens=8, eos_token_id=-2, pad_token_id=0)
    eng = Engine(model, params, gen, num_slots=2, prompt_buf=16,
                 cache_dtype=jnp.float32, speculative=True, block_len=4)
    ids = jnp.ones((1, 5), jnp.int32)
    eng.submit(ids)
    out = eng.run()
    assert len(out[0]) == 8
    assert eng.spec_stats["verify_steps"] >= 1
    # every token after tok0 was emitted by a verify step
    assert eng.spec_stats["emitted_tokens"] == 7


def test_llm_server_closes_synthesis_loop(llm_server_url):
    """data/synthesis.py's OpenAI-protocol client talks to OUR server —
    the full synthesis loop runs with no external LLM dependency."""
    from u2tokenizer_tpu.data.synthesis import (LLMClientConfig,
                                                OpenAIProtocolClient,
                                                rewrite_report)

    cfg = LLMClientConfig()
    cfg.base_url = llm_server_url + "/v1"
    cfg.max_retries = 2
    client = OpenAIProtocolClient(cfg)
    out = rewrite_report(client, "the lungs are clear")
    assert isinstance(out, str) and len(out) >= 0


def test_index_page_served(server_url):
    url, _ = server_url
    with urllib.request.urlopen(url + "/", timeout=600) as resp:
        body = resp.read().decode()
    assert resp.status == 200
    assert "<html" in body and "/v1/report" in body


def _post_sse(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        ctype = resp.headers.get("Content-Type", "")
        lines = resp.read().decode().splitlines()
    chunks = [ln[len("data: "):] for ln in lines if ln.startswith("data: ")]
    assert chunks and chunks[-1] == "[DONE]"
    return ctype, [json.loads(c) for c in chunks[:-1]]


def test_chat_stream_sse(server_url):
    url, _ = server_url
    ctype, chunks = _post_sse(url + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hello scan"}],
        "stream": True,
    })
    assert ctype.startswith("text/event-stream")
    text = "".join(c["choices"][0]["delta"]["content"] for c in chunks)
    assert isinstance(text, str) and len(chunks) >= 1


def test_report_stream_sse(server_url):
    url, vol_path = server_url
    ctype, chunks = _post_sse(url + "/v1/report", {
        "image_path": vol_path, "question": "what do you see?",
        "stream": True,
    })
    assert ctype.startswith("text/event-stream")
    # non-slot backends fall back to a single final chunk
    text = "".join(c["report_delta"] for c in chunks)
    assert isinstance(text, str)


def test_upload_slice_viewer_and_config(server_url):
    """online_demo.py parity surface: upload raw volume bytes, browse
    slices as PNG, read the load-option config."""
    url, vol = server_url

    # upload the raw NIfTI bytes
    with open(vol, "rb") as f:
        data = f.read()
    req = urllib.request.Request(
        url + "/v1/upload", data=data,
        headers={"Content-Type": "application/octet-stream",
                 "X-Filename": "case.nii.gz"})
    with urllib.request.urlopen(req, timeout=600) as resp:
        info = json.loads(resp.read())
    assert info["volume_id"].startswith("vol-")
    assert info["chunks"] >= 1 and info["depth"] >= 1

    # slice endpoint returns a real PNG
    with urllib.request.urlopen(
            f"{url}/v1/volume/{info['volume_id']}/slice/0") as resp:
        png = resp.read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(png) > 100

    # unknown volume -> 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(url + "/v1/volume/vol-nope/slice/0")
    assert e.value.code == 404

    # generate against the uploaded volume id
    status, out = _post(url + "/v1/report",
                        {"volume_id": info["volume_id"],
                         "question": "describe findings"})
    assert status == 200 and "report" in out

    # config readout (weights/speculative toggles surface)
    with urllib.request.urlopen(url + "/v1/config") as resp:
        cfg = json.loads(resp.read())
    assert cfg["weights"] == "bf16"
    # r5 default: SAMPLED report serving rides speculative decode
    # (measured 1.17-1.29x on report content — BENCHMARKS.md "Speculative
    # SAMPLING"); greedy serving stays plain (spec greedy measured a net
    # loss at B64), so the default follows do_sample
    assert cfg["speculative"] is True


def test_demo_page_has_upload_and_slice_viewer(server_url):
    url, _ = server_url
    with urllib.request.urlopen(url + "/") as resp:
        html = resp.read().decode()
    for needle in ("/v1/upload", "slice", "slider", "type=\"file\"",
                   "/v1/config"):
        assert needle in html, needle
