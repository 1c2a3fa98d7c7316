"""fastllama_tpu — a TPU-native quantized LLM inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
CoderLSF/fast-llama (a CPU C++ engine): group-quantized INT16/INT8/INT4
LLaMA-family inference with fused TPU kernels, GSPMD sharding over device
meshes, and loaders for llama2.c / FLM / GGUF / HuggingFace checkpoints.
"""

__version__ = "0.1.0"

from fastllama_tpu.config import (ActivationType, EngineConfig, ModelArchitecture,
                                  ModelConfig, QuantType)
from fastllama_tpu.quant.groupquant import QArray, dequantize, quantize

__all__ = [
    "ActivationType", "EngineConfig", "ModelArchitecture", "ModelConfig",
    "QuantType", "QArray", "dequantize", "quantize",
    # heavier entry points live in submodules to keep import light:
    # runtime.engine.Engine, runtime.batching.BatchedEngine,
    # runtime.multihost.MultiHostEngine, runtime.speculative.SpeculativeEngine
]
