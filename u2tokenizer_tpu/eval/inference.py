"""High-level inference wrapper + answer validation.

Behavioral rebuild of green_refactored/lu2_model.py:18-66 (Lu2Model: load an
HF-layout μ² checkpoint, ``inference(image, question)`` with the 256
<im_patch> prefix and sampling generate) and
green_refactored/answer_validator.py:8-53 (LLM yes/no validity check).
"""

from __future__ import annotations

import json
import os
import re
from typing import Callable, Optional, Sequence, Union

import numpy as np


def check_character_and_length(text: str, min_len: int = 20) -> bool:
    """Validity filter from pred_then_green.py:97-103: reject CJK output and
    too-short generations."""
    if len(text) < min_len:
        return False
    return not any("一" <= ch <= "鿿" for ch in text)


class U2InferenceModel:
    """Checkpoint-dir -> ``inference(image, question)`` (Lu2Model surface).

    Accepts our exported checkpoints (hf_export.save_hf_checkpoint) or
    reference-trained ones (pytorch_model.bin / safetensors with the u2
    naming scheme). Optional LoRA adapters are merged at load
    (lu2_model.py:24-27 merge behavior).
    """

    def __init__(self, checkpoint_path: str, tokenizer=None,
                 model_config=None, dtype=None, max_length: int = 1024,
                 max_new_tokens: int = 768, do_sample: bool = True,
                 top_p: float = 0.9, lora_path: Optional[str] = None,
                 seed: int = 0, speculative: Optional[bool] = None,
                 weights: str = "bf16"):
        import jax
        import jax.numpy as jnp

        from ..config import GenerationConfig, U2ModelConfig
        from ..models.generate import make_multimodal_generate_fn
        from ..models.speculative import make_spec_multimodal_generate_fn
        from ..models.hf_weights import (convert_u2_checkpoint,
                                         load_safetensors_dir, load_torch_bin,
                                         llm_config_from_hf)
        from ..models.u2_model import U2CausalLM

        self._jax = jax
        self._jnp = jnp

        if model_config is None:
            tpu_cfg = os.path.join(checkpoint_path, "u2_tpu_config.json")
            if os.path.exists(tpu_cfg):
                model_config = U2ModelConfig.from_json(open(tpu_cfg).read())
            else:
                with open(os.path.join(checkpoint_path, "config.json")) as f:
                    hf = json.load(f)
                model_config = U2ModelConfig(llm=llm_config_from_hf(hf))
        self.cfg = model_config

        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(checkpoint_path)
        self.tokenizer = tokenizer

        if os.path.isdir(checkpoint_path) and any(
                f.endswith(".safetensors") for f in os.listdir(checkpoint_path)):
            sd = load_safetensors_dir(checkpoint_path)
        else:
            bin_path = (checkpoint_path if checkpoint_path.endswith(".bin")
                        else os.path.join(checkpoint_path, "pytorch_model.bin"))
            sd = load_torch_bin(bin_path)
        self.params = convert_u2_checkpoint(sd, self.cfg)

        if lora_path is not None:
            self._merge_lora(lora_path)

        # serving weight precision (the online_demo.py bf16/8-bit/4-bit load
        # toggles, src/demo/online_demo.py:20-60): int8/int4 quantize the
        # decoder weight-only (models/quantize.py), bf16 casts matrices.
        self.weights = weights
        if weights in ("int8", "int4"):
            from ..models.quantize import (cast_for_inference,
                                           quantize_llm_weights,
                                           quantized_llm_config)

            self.params = jax.jit(cast_for_inference)(self.params)
            if weights == "int8":
                self.params = jax.jit(quantize_llm_weights)(self.params)
            else:
                # int4 runs unjitted: S4 arrays cannot cross jit boundaries
                # on the axon relay (see bench.py int4 notes)
                self.params = quantize_llm_weights(self.params, mode="int4")
            self.cfg = quantized_llm_config(self.cfg, weights)
        elif weights == "bf16":
            pass  # model dtype below already computes in bf16
        self.model = U2CausalLM(self.cfg, dtype=dtype or jnp.bfloat16)
        self.max_length = max_length
        gen = GenerationConfig(
            max_new_tokens=max_new_tokens, do_sample=do_sample, top_p=top_p,
            eos_token_id=tokenizer.eos_token_id,
            pad_token_id=tokenizer.pad_token_id or 0)
        self.gen_cfg = gen
        # ``speculative``: n-gram-drafted decode — identical tokens when
        # greedy, identical distribution when sampling. DEFAULT ON only for
        # SAMPLED report serving (r5): speculative SAMPLING measured a
        # 1.29x win at B64 and 1.17x at B16 on AMOS-style report content
        # (acceptance 1.77-1.79; BENCHMARKS.md "Speculative SAMPLING",
        # docs/artifacts/r5/spec_sampling_b64.json) — radiology reports are
        # template-heavy, which is exactly the acceptance regime. GREEDY
        # spec decode is a measured net LOSS on the same content (200.5 vs
        # 245.0 r/min plain at B64: the verify step costs ~2.2x a greedy
        # step, more than acceptance 1.77 recovers), so greedy serving
        # stays plain unless explicitly requested — matching cli generate
        # and the slot engine. Pass speculative=False to force plain
        # sampling for adversarial/low-acceptance content (the crossover
        # is ~1.3-1.5 accepted tokens/step).
        if speculative is None:
            speculative = bool(do_sample)
        self._speculative = speculative
        if speculative:
            self._gen_fn = make_spec_multimodal_generate_fn(
                self.model, gen, return_stats=True)
        else:
            self._gen_fn = make_multimodal_generate_fn(self.model, gen)
        self._rng = jax.random.PRNGKey(seed)
        # acceptance telemetry (speculative only): cumulative emitted tokens
        # vs device verify steps — mean acceptance = tokens / steps
        self.spec_stats = {"emitted_tokens": 0, "verify_steps": 0}

    def _merge_lora(self, lora_path: str):
        from flax import serialization

        from ..train.lora import LoraConfig, merge_lora

        with open(os.path.join(lora_path, "adapter.msgpack"), "rb") as f:
            lora = serialization.msgpack_restore(f.read())
        with open(os.path.join(lora_path, "adapter_config.json")) as f:
            acfg = json.load(f)
        self.params = merge_lora(
            self.params, lora, LoraConfig(r=acfg["r"], alpha=acfg["alpha"]))

    def _encode_prompt(self, question: str, with_image: bool = True):
        n_img = self.cfg.proj_out_num
        prompt = ("<im_patch>" * n_img + question) if with_image else question
        ids = self.tokenizer(prompt, add_special_tokens=False)["input_ids"]
        ids = ids[: self.max_length]
        out = np.full(self.max_length, self.gen_cfg.pad_token_id, np.int32)
        out[: len(ids)] = ids
        q = self.tokenizer(question, add_special_tokens=False)["input_ids"][:64]
        qids = np.full(64, self.gen_cfg.pad_token_id, np.int32)
        qids[: len(q)] = q
        return out, qids, len(ids)

    def inference(self, image: np.ndarray, question: str) -> str:
        """(T, D, H, W) preprocessed volume + question -> report text
        (lu2_model.py:52-66 protocol). ``image=None`` runs the text-only
        path (the reference generate's vision_input=None branch)."""
        jnp = self._jnp
        with_image = image is not None
        images = None
        if with_image:
            arr = np.asarray(image)
            expected = (self.cfg.num_chunks, *self.cfg.vision.input_spatial)
            if tuple(arr.shape) != expected:
                raise ValueError(
                    f"volume shape {tuple(arr.shape)} does not match the "
                    f"model's chunk geometry {expected}; preprocess with "
                    "U2VolumeTransform (serve handles .nii/.nii.gz "
                    "automatically; .npy must already be chunked)")
            images = jnp.asarray(arr[None], jnp.float32)
        input_id, qids, plen = self._encode_prompt(question, with_image)
        self._rng, sub = self._jax.random.split(self._rng)
        toks = self._gen_fn(self.params, jnp.asarray(input_id[None]),
                            images, jnp.asarray(qids[None]),
                            jnp.asarray([plen], jnp.int32), sub)
        if self._speculative:
            toks, steps = toks
            row = np.asarray(toks)[0]
            eos = np.nonzero(row == self.tokenizer.eos_token_id)[0]
            emitted = int(eos[0]) + 1 if eos.size else row.shape[0]
            # tok0 comes from the prefill, not a verify step: acceptance =
            # emitted_tokens / verify_steps over the block-decode loop
            self.spec_stats["emitted_tokens"] += max(emitted - 1, 0)
            self.spec_stats["verify_steps"] += int(np.asarray(steps))
        ids = [int(t) for t in np.asarray(toks)[0]
               if t not in (self.gen_cfg.pad_token_id,
                            self.tokenizer.eos_token_id)]
        return self.tokenizer.decode(ids, skip_special_tokens=True).strip()

    def sample_valid(self, image: np.ndarray, question: str,
                     attempts: int = 5) -> str:
        """Resample until the validity filter passes
        (pred_then_green.py:77-82 loop)."""
        text = ""
        for _ in range(attempts):
            text = self.inference(image, question)
            if check_character_and_length(text):
                return text
        return text


class AnswerValidator:
    """LLM yes/no check that a generated answer addresses the question
    (answer_validator.py:8-53)."""

    PROMPT = (
        "You are verifying a VQA system's output. Question: {question}\n"
        "Generated answer: {answer}\n"
        "Is this a plausible, on-topic answer to the question? "
        "Reply with only YES or NO.")

    def __init__(self, backend: Callable[[str], str]):
        self.backend = backend

    def __call__(self, question: str, answer: str) -> bool:
        out = self.backend(self.PROMPT.format(question=question,
                                              answer=answer))
        return out.strip().upper().startswith("YES")


def green_chat_format(prompt: str, eos_token: str = "</s>") -> str:
    """The GREEN judge chat rendering (green.py:59 custom template): a human
    turn, an empty assistant turn, then the generation prompt."""
    return (f"\n<|user|>\n{prompt}{eos_token}\n\n<|assistant|>\n{eos_token}\n"
            f"\n<|assistant|>")
