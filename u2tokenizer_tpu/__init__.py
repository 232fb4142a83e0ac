"""μ²-TPU: TPU-native (JAX/XLA/Pallas) framework for 3D CT report generation.

From-scratch rebuild of the capabilities of Siyou-Li/u2Tokenizer (μ²LLM,
MICCAI 2025): CT ingest, 3D ViT encoding, differentiable multi-scale
μ²tokenizer, Qwen3/Llama/Phi-3 decoding, SFT + GREEN-guided DPO training,
and the GREEN evaluation stack — designed for TPU meshes via pjit/shard_map.
"""

__version__ = "0.1.0"

from .config import (  # noqa: F401
    DPOConfig,
    GenerationConfig,
    LLMConfig,
    MeshConfig,
    ProjectorConfig,
    TrainConfig,
    U2ModelConfig,
    U2TokenizerConfig,
    VisionConfig,
)
