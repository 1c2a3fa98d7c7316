"""Checkpoint format detection + unified load path.

The counterpart of ``TransformerModel::load`` + ``detect_file_type``
(``/root/reference/src/model_loaders/model_loader.cpp:40-85``): sniff the
magic, dispatch to a format loader, then normalize everything into device
params:

1. deinterleave Wq/Wk rows for formats in the Meta/interleaved RoPE
   convention (llama2c/FLM/GGUF) — see ops/rope.py,
2. quantize fp32 projections on load to the engine's quant type
   (llama2c_loader.cpp:117-124 semantics), or keep pre-quantized data,
3. stack per-layer tensors and device_put as a LlamaParams pytree
   (optionally with GSPMD shardings from parallel/sharding.py).
"""
from __future__ import annotations

import dataclasses
import enum
import os
from typing import Optional, Tuple

import numpy as np

from fastllama_tpu.config import ModelConfig, QuantType
from fastllama_tpu.loaders import flm, gguf, hf, llama2c
from fastllama_tpu.loaders.tokenizer import Tokenizer
from fastllama_tpu.models.llama import LlamaParams, build_params
from fastllama_tpu.ops.rope import deinterleave_heads, deinterleave_perm


class FileType(enum.Enum):
    UNKNOWN = 0
    FLM = 1
    GGUF = 2
    LLAMA2C = 3
    HF = 4

    @staticmethod
    def parse(name: str) -> "FileType":
        return {"flm": FileType.FLM, "gguf": FileType.GGUF,
                "llama2c": FileType.LLAMA2C, "hf": FileType.HF,
                "": FileType.UNKNOWN, "unknown": FileType.UNKNOWN}[name.lower()]


# formats whose Wq/Wk rows follow the Meta interleaved-pair RoPE convention
_INTERLEAVED = {FileType.FLM, FileType.GGUF, FileType.LLAMA2C}


def detect_file_type(path: str) -> FileType:
    """Magic-number sniffing (model_loader.cpp:40-66)."""
    if hf.is_hf_dir(path):
        return FileType.HF
    if flm.is_flm(path):
        return FileType.FLM
    if gguf.is_gguf(path):
        return FileType.GGUF
    if llama2c.is_llama2c(path):
        return FileType.LLAMA2C
    return FileType.UNKNOWN


@dataclasses.dataclass
class LoadedModel:
    config: ModelConfig
    weights: dict            # numpy: fp32 arrays or (data, scales) tuples
    tokenizer: Tokenizer
    file_type: FileType

    def build(self, qtype: Optional[QuantType] = None,
              device_put=None) -> LlamaParams:
        kw = {} if device_put is None else {"device_put": device_put}
        qt = qtype if qtype is not None else self.config.quant_type
        if qt == QuantType.INT4 and self.config.hidden_dim % 512:
            # zero-pad hidden_dim to a 512 multiple so the FFN down
            # projection's contraction axis tiles for nibble packing
            # (exact: silu(0)*0 rows feed zero columns); updates self.config
            from fastllama_tpu.parallel.sharding import pad_hidden_for_sharding
            self.config = pad_hidden_for_sharding(
                self.config, self.weights,
                512 // self.config.group_size)
        return build_params(self.config, self.weights, qtype, **kw)


def _deinterleave(weights: dict, head_size: int) -> None:
    """Convert Wq/Wk rows to the half layout.  Quant groups ride along the
    input axis, so the same row (axis -2) permutation applies to per-row
    scale arrays unchanged."""
    for key in ("wq", "wk"):
        v = weights.get(key)
        if v is None:
            continue
        if isinstance(v, tuple):
            data, scales = v
            weights[key] = (deinterleave_heads(data, head_size),
                            deinterleave_heads(scales, head_size))
        else:
            weights[key] = deinterleave_heads(v, head_size)


def resolve_and_build(ckpt_path: str, tokenizer_path: str,
                      file_type: "FileType", qtype, engine_config,
                      device_put=None):
    """Shared Engine/BatchedEngine load path: load the checkpoint, resolve
    the effective quant type (user request vs pre-quantized file,
    transformer.cpp:36-38), pad hidden_dim for a mesh, and build device (or
    host, for sharded load) params.  Returns (config, params, tokenizer)."""
    m = load_model(ckpt_path, tokenizer_path, file_type)
    cfg = m.config
    if qtype is not None and cfg.quant_type == QuantType.NONE:
        cfg = cfg.replace(quant_type=qtype)
    elif m.file_type in (FileType.FLM, FileType.GGUF) \
            and cfg.quant_type != QuantType.NONE:
        qtype = cfg.quant_type          # pre-quantized file wins
    if engine_config is not None and engine_config.mesh and device_put is None:
        # keep weights host-side; the engine device_puts each leaf once
        # with its TP sharding (each device receives only its shard)
        from fastllama_tpu.parallel.sharding import pad_hidden_for_sharding
        mp = 1
        for part in engine_config.mesh.split(","):
            k, v = part.split("=")
            if k.strip() == "model":
                mp = int(v)
        cfg = pad_hidden_for_sharding(cfg, m.weights, mp)
        m.config = cfg
        device_put = np.asarray
    params = m.build(qtype, device_put=device_put)
    # build() may pad hidden_dim further (INT4 packing alignment)
    cfg = cfg.replace(hidden_dim=m.config.hidden_dim)
    return cfg, params, m.tokenizer


def stack_layers(per_layer: dict, n_layers: int):
    """Stack a {field: {layer_id: array-or-(data,scales)}} map into (L, ...)
    arrays (shared by the FLM and GGUF loaders)."""
    out = {}
    for field, layers in per_layer.items():
        first = layers[0]
        if isinstance(first, tuple):
            out[field] = (np.stack([layers[i][0] for i in range(n_layers)]),
                          np.stack([layers[i][1] for i in range(n_layers)]))
        else:
            out[field] = np.stack([layers[i] for i in range(n_layers)])
    return out


def load_model(path: str, tokenizer_path: str = "",
               file_type: FileType = FileType.UNKNOWN,
               tokenizer_only: bool = False) -> LoadedModel:
    ft = file_type if file_type != FileType.UNKNOWN else detect_file_type(path)
    if ft == FileType.UNKNOWN:
        raise ValueError(f"cannot detect checkpoint format of {path}")
    if ft == FileType.FLM:
        cfg, weights, tok = flm.load_flm(path, tokenizer_only)
    elif ft == FileType.GGUF:
        cfg, weights, tok = gguf.load_gguf(path, tokenizer_only)
    elif ft == FileType.LLAMA2C:
        cfg, weights, tok = llama2c.load_llama2c(path, tokenizer_path,
                                                 tokenizer_only)
    else:
        cfg, weights, tok = hf.load_hf(path, tokenizer_only)

    if weights and ft in _INTERLEAVED:
        _deinterleave(weights, cfg.head_size)
    return LoadedModel(cfg, weights, tok, ft)
