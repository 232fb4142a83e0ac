"""GREEN scorer tests: parser variants, score formula, end-to-end with a
stub judge, and the JaxJudge decoder backend."""

import numpy as np
import pytest

from test_data import MockTokenizer

from u2tokenizer_tpu.eval.green import (
    CATEGORIES,
    GreenScorer,
    JaxJudge,
    clean_response,
    compute_error_count,
    compute_green,
    make_green_prompt,
    parse_error_counts,
)
from u2tokenizer_tpu.eval.metrics import (
    bleu,
    exact_match_accuracy,
    meteor,
    rouge_l,
    rouge_n,
    score_report,
)

RESPONSE_LETTERS = """[Explanation]:
The candidate mostly matches.

[Clinically Significant Errors]:
(a) False report of a finding in the candidate: 2. Pleural effusion; Mass
(b) Missing a finding present in the reference: 1. Nodule
(c) Misidentification of a finding's anatomic location/position: 0.
(d) Misassessment of the severity of a finding: 0.
(e) Mentioning a comparison that isn't in the reference: 0.
(f) Omitting a comparison detailing a change from a prior study: 0.

[Clinically Insignificant Errors]:
(a) False report of a finding in the candidate: 1. Minor note
(b) Missing a finding present in the reference: 0.
(c) Misidentification of a finding's anatomic location/position: 0.
(d) Misassessment of the severity of a finding: 0.
(e) Mentioning a comparison that isn't in the reference: 0.
(f) Omitting a comparison detailing a change from a prior study: 0.

[Matched Findings]:
6. Clear lungs; Normal heart; No pneumothorax; Normal bones; Clear airway; Normal pleura
"""

RESPONSE_NUMBERS = RESPONSE_LETTERS.replace("(a)", "(1)").replace(
    "(b)", "(2)").replace("(c)", "(3)").replace("(d)", "(4)").replace(
    "(e)", "(5)").replace("(f)", "(6)")

RESPONSE_NO_ERRORS = """[Explanation]:
Perfect match.

[Clinically Significant Errors]:
No errors found.

[Clinically Insignificant Errors]:
No errors found.

[Matched Findings]:
4. A; B; C; D
"""

RESPONSE_NO_MATCH = """[Explanation]:
Nothing matches.

[Clinically Significant Errors]:
(a) False report of a finding in the candidate: 3. X; Y; Z
(b) Missing a finding present in the reference: 2. P; Q
(c) Misidentification of a finding's anatomic location/position: 0.
(d) Misassessment of the severity of a finding: 0.
(e) Mentioning a comparison that isn't in the reference: 0.
(f) Omitting a comparison detailing a change from a prior study: 0.

[Matched Findings]:
0. None
"""



# pure-host fast tier (tests/conftest.py allowlist policy)
pytestmark = pytest.mark.fast

def test_parse_letter_format():
    total, subs = parse_error_counts(RESPONSE_LETTERS, CATEGORIES[0])
    assert subs == [2, 1, 0, 0, 0, 0]
    assert total == 3
    matched, _ = parse_error_counts(RESPONSE_LETTERS, CATEGORIES[2])
    assert matched == 6


def test_parse_number_format():
    total, subs = parse_error_counts(RESPONSE_NUMBERS, CATEGORIES[0])
    assert subs == [2, 1, 0, 0, 0, 0]
    assert total == 3


def test_parse_no_errors():
    total, subs = parse_error_counts(RESPONSE_NO_ERRORS, CATEGORIES[0])
    assert total == 0 and subs == [0] * 6


def test_parse_missing_category():
    total, subs = parse_error_counts("[Explanation]: nothing here", CATEGORIES[0])
    assert total == 0 and subs == [0] * 6
    assert parse_error_counts("nothing", CATEGORIES[0], for_reward=True) == (None, None)


def test_green_formula():
    # 6 matched, 3 significant -> 6/9
    np.testing.assert_allclose(compute_green(RESPONSE_LETTERS), 6 / 9)
    assert compute_green(RESPONSE_NO_ERRORS) == 1.0
    assert compute_green(RESPONSE_NO_MATCH) == 0.0
    assert compute_error_count(RESPONSE_LETTERS) == [2, 1, 0, 0, 0, 0, 6]


def test_clean_response_keeps_last_block():
    doubled = "[Explanation]: echo of prompt\n\n" + RESPONSE_LETTERS
    out = clean_response(doubled)
    assert out.startswith("[Explanation]:\nThe candidate mostly matches")


def test_prompt_contains_reports_and_format():
    p = make_green_prompt("REF_TEXT_HERE", "CAND_TEXT_HERE")
    assert "REF_TEXT_HERE" in p and "CAND_TEXT_HERE" in p
    assert "[Clinically Significant Errors]" in p
    assert "[Matched Findings]" in p
    # 300-word truncation
    long = " ".join(f"w{i}" for i in range(400))
    p2 = make_green_prompt(long, "x")
    assert "w299" in p2 and "w300" not in p2


@pytest.mark.slow  # jits a judge decode loop (155 s / 4 s measured)
def test_scorer_end_to_end_with_stub_judge():
    responses = [RESPONSE_LETTERS, RESPONSE_NO_ERRORS, RESPONSE_NO_MATCH]
    scorer = GreenScorer(lambda prompts: responses[: len(prompts)])
    result = scorer(["r1", "r2", "r3"], ["h1", "h2", "h3"])
    np.testing.assert_allclose(result.scores, [6 / 9, 1.0, 0.0])
    np.testing.assert_allclose(result.mean, np.mean([6 / 9, 1.0, 0.0]))
    assert "Green average" in result.summary
    assert len(result.rows) == 3


@pytest.mark.slow  # jits a judge decode loop (155 s / 4 s measured)
def test_jax_judge_runs():
    import jax
    import jax.numpy as jnp

    from u2tokenizer_tpu.config import LLMConfig
    from u2tokenizer_tpu.models.llm.decoder import CausalLM

    tok = MockTokenizer()

    class DecTok(MockTokenizer):
        def decode(self, ids, skip_special_tokens=True):
            inv = {v: k for k, v in self.vocab.items()}
            return " ".join(inv.get(i, "?") for i in ids)

    tok = DecTok()
    cfg = LLMConfig.tiny(vocab_size=64)
    model = CausalLM(cfg, dtype=jnp.float32)
    dummy = jnp.zeros((1, 8, cfg.hidden_size))
    pos = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 1, 8, 8), bool)
    params = model.init(jax.random.PRNGKey(0), dummy, pos, mask)
    judge = JaxJudge(model, params, tok, batch_size=2, max_length=32,
                     max_new_tokens=8)
    outs = judge(["evaluate this report", "another case", "third"])
    assert len(outs) == 3
    assert all(isinstance(o, str) for o in outs)


def test_nlg_metrics():
    ref = "the lungs are clear with no pleural effusion"
    assert bleu(ref, ref) > 0.99
    assert rouge_n(ref, ref, 1)["f"] == 1.0
    assert rouge_n(ref, ref, 2)["f"] == 1.0
    assert rouge_l(ref, ref)["f"] == 1.0
    assert meteor(ref, ref) > 0.9
    hyp = "the lungs are clear"
    r = rouge_l(ref, hyp)
    assert r["precision"] == 1.0 and r["recall"] == 0.5
    assert exact_match_accuracy(["A", "B"], ["A. choice", "C"]) == 0.5
    s = score_report(ref, hyp)
    assert set(s) == {"bleu1", "rouge1_f", "rouge2_f", "rougeL_f", "meteor"}


def test_openai_batch_judge_against_mock_server(tmp_path):
    """Drive the full batch-file workflow (generate/upload/create/probe/
    fetch — green_refactored/green.py:148-186 parity) against a local mock
    of the OpenAI batch API; results must come back prompt-ordered even
    when the server returns them shuffled."""
    import http.server
    import json
    import threading

    from u2tokenizer_tpu.eval.green import OpenAIBatchJudge

    store = {"files": {}, "batches": {}}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            if self.path == "/v1/files":
                # multipart: pull out the jsonl payload between the file
                # part header and the closing boundary
                text = raw.split(b"\r\n\r\n", 2)[-1]
                payload = text.rsplit(b"\r\n--", 1)[0]
                fid = f"file_{len(store['files'])}"
                store["files"][fid] = payload
                self._json({"id": fid, "purpose": "batch"})
            elif self.path == "/v1/batches":
                req = json.loads(raw)
                assert req["endpoint"] == "/v1/chat/completions"
                bid = f"batch_{len(store['batches'])}"
                # build shuffled results echoing each prompt's index
                rows = [json.loads(l) for l in
                        store["files"][req["input_file_id"]].splitlines()]
                out = []
                for row in reversed(rows):  # reversed = shuffled order
                    content = ("[Explanation]:\nok\n\n"
                               "[Clinically Significant Errors]:\n"
                               "(a) False report: 0.\n\n"
                               "[Clinically Insignificant Errors]:\n"
                               "(a) False report: 0.\n\n"
                               "[Matched Findings]:\n"
                               f"{int(row['custom_id'].split('_')[-1]) + 1}. "
                               "f1\n")
                    out.append(json.dumps({
                        "custom_id": row["custom_id"],
                        "response": {"body": {"choices": [
                            {"message": {"content": content}}]}}}))
                ofid = f"file_out_{bid}"
                store["files"][ofid] = "\n".join(out).encode()
                store["batches"][bid] = {
                    "id": bid, "status": "completed",
                    "output_file_id": ofid}
                self._json(store["batches"][bid])
            else:
                self._json({"error": "not found"}, 404)

        def do_GET(self):
            if self.path.startswith("/v1/batches/"):
                bid = self.path.rsplit("/", 1)[-1]
                self._json(store["batches"][bid])
            elif self.path.startswith("/v1/files/") and \
                    self.path.endswith("/content"):
                fid = self.path.split("/")[3]
                body = store["files"][fid]
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json({"error": "not found"}, 404)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        judge = OpenAIBatchJudge(
            base_url=f"http://127.0.0.1:{srv.server_port}/v1",
            api_key="test", model="mock", poll_seconds=0.05)
        prompts = [make_green_prompt("ref a", "hyp a"),
                   make_green_prompt("ref b", "hyp b"),
                   make_green_prompt("ref c", "hyp c")]
        responses = judge(prompts)
        assert len(responses) == 3
        # order restored: response i reports i+1 matched findings
        for i, r in enumerate(responses):
            assert f"[Matched Findings]:\n{i + 1}." in r
        # and it composes with the scorer
        scorer = GreenScorer(judge, compute_summary_stats=False)
        result = scorer(["ref a", "ref b", "ref c"], ["a", "b", "c"])
        assert result.scores == [1.0, 1.0, 1.0]
    finally:
        srv.shutdown()


def test_parser_against_judge_response_fixtures():
    """Parser contract over the realistic judge-output fixture bank
    (tests/fixtures/green_responses/): every output variant the reference
    parser handles (letter/number labels, 'No ...' bodies, prompt echo,
    truncation, zero matches, messy formatting) must score exactly as
    recorded in expected_scores.json."""
    import json
    import os

    from u2tokenizer_tpu.eval.green import parse_error_counts

    fixdir = os.path.join(os.path.dirname(__file__), "fixtures",
                          "green_responses")
    with open(os.path.join(fixdir, "expected_scores.json")) as f:
        expected = json.load(f)
    assert len(expected) >= 7
    for name, exp in expected.items():
        with open(os.path.join(fixdir, name)) as f:
            response = clean_response(f.read())
        score = compute_green(response)
        assert score == pytest.approx(exp["green"]), name
        _, sig = parse_error_counts(response, CATEGORIES[0])
        assert sig == exp["sig"], name
        matched, _ = parse_error_counts(response, CATEGORIES[2])
        assert matched == exp["matched"], name
