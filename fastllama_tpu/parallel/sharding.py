"""GSPMD sharding rules — the TPU replacement for the reference's
thread-level tensor parallelism.

The reference statically splits weight **rows** across pinned threads
(``transformer.cpp:253-384``: QKV/FFN13/CLS row-split, O/FFN2 row-split with
add-at-offset reduction, KV-head split for attention with per-thread KV
caches, transformer.cpp:366-374).  Here the identical decomposition is
expressed as ``NamedSharding`` annotations over a ``('data', 'model')`` mesh
and XLA GSPMD inserts the collectives (all-gather / reduce-scatter riding
ICI) that the reference's shared-memory writes-at-offsets implement in RAM:

* wq/wk/wv, w1/w3 : output-features axis over 'model'  (column parallel)
* wo, w2          : input-features axis over 'model'   (row parallel -> psum)
* embedding, classifier : vocab axis over 'model'
* KV cache        : kv-heads axis over 'model' (the GSPMD analogue of the
  reference's per-thread KV caches)
* norms, activations : replicated over 'model'; batch over 'data'
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fastllama_tpu.config import ModelConfig
from fastllama_tpu.models.llama import KVCache, LlamaParams
from fastllama_tpu.quant.groupquant import QArray

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(spec: str = "", devices=None) -> Mesh:
    """Build a mesh from 'data=2,model=4'-style spec; default = all devices
    on the 'model' axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not spec:
        shape = {DATA_AXIS: 1, MODEL_AXIS: n}
    else:
        shape = {DATA_AXIS: 1, MODEL_AXIS: 1}
        for part in spec.split(","):
            k, v = part.split("=")
            shape[k.strip()] = int(v)
    total = shape[DATA_AXIS] * shape[MODEL_AXIS]
    if total > n:
        raise ValueError(f"mesh {shape} needs {total} devices, have {n}")
    if total < n:
        # single-process convenience only: a subset mesh in a multi-process
        # run would exclude some processes' devices and hang collectives
        if jax.process_count() > 1:
            raise ValueError(
                f"mesh {shape} covers {total} of {n} devices; multi-process "
                f"meshes must include every device")
        import warnings
        warnings.warn(f"mesh {shape} uses only {total} of {n} devices")
    arr = np.asarray(devices[:total]).reshape(shape[DATA_AXIS],
                                              shape[MODEL_AXIS])
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


KV_AXIS = "kv"
REP_AXIS = "rep"


def gqa_submesh(mesh: Mesh, n_kv_heads: int) -> Mesh:
    """A view of ``mesh`` whose 'model' axis is split into ('kv', 'rep') for
    GQA over-sharding (model > n_kv_heads): each KV head lives on the
    ``rep = model/n_kv`` devices that hold its query-head group — groupwise
    replication instead of full replication (the reference's analogous
    constraint is n_heads % n_kv_heads == 0, transformer.cpp:215-218).
    Same devices, same order, so shardings from both views compose under
    one jit."""
    mp = mesh.shape[MODEL_AXIS]
    if mp % n_kv_heads:
        raise ValueError(f"model axis {mp} not a multiple of n_kv_heads "
                         f"{n_kv_heads}")
    devs = mesh.devices.reshape(mesh.shape[DATA_AXIS], n_kv_heads,
                                mp // n_kv_heads)
    return Mesh(devs, (DATA_AXIS, KV_AXIS, REP_AXIS))


def _fit_spec(mesh: Mesh, shape, spec: P) -> P:
    """Drop sharding on axes whose extent isn't divisible by the mesh axis
    (used for the small per-group scale arrays; the data arrays themselves
    must divide — pad_hidden_for_sharding aligns them)."""
    out = []
    for i, ax in enumerate(spec):
        if ax is None:
            out.append(None)
        else:
            out.append(ax if shape[i] % mesh.shape[ax] == 0 else None)
    return P(*out)


def _leaf(mesh: Mesh, value, data_spec: P):
    """NamedSharding tree matching a params leaf (QArray or plain array).
    For a QArray the scales share the spec (their last axis is I/gs, sharded
    like I); scales axes too small to split stay replicated — they are
    1/group_size the data's size, so replication is cheap."""
    if isinstance(value, QArray):
        ds = NamedSharding(mesh, data_spec)
        ss = NamedSharding(mesh, _fit_spec(mesh, value.scales.shape, data_spec))
        # static fields (incl. packed) must match the params tree exactly —
        # register_dataclass statics are part of the treedef
        return QArray(ds, ss, value.qtype, value.group_size, value.group_axis,
                      value.packed)
    return NamedSharding(mesh, data_spec)


def param_shardings(cfg: ModelConfig, mesh: Mesh, params: LlamaParams
                    ) -> LlamaParams:
    """A LlamaParams-shaped tree of NamedShardings.

    Column-parallel weights shard the out-features axis; row-parallel shard
    in-features.  Scales arrays mirror their data array's sharded axis
    (groups run along the in-features axis; when that axis is sharded the
    scales' matching axis shards identically because group_size divides the
    per-shard extent)."""
    mp = mesh.shape[MODEL_AXIS]
    if cfg.n_kv_heads % mp != 0 and mp % cfg.n_kv_heads != 0:
        raise ValueError(
            f"model axis {mp} incompatible with n_kv_heads={cfg.n_kv_heads}"
            " (reference analogue: n_heads % n_kv_heads == 0,"
            " transformer.cpp:215-218)")

    # transposed (in, out) weight layout: (L, I, O), scales (L, I/gs, O)
    col = P(None, None, MODEL_AXIS)    # shard out-features (lanes)
    row = P(None, MODEL_AXIS, None)    # shard in-features (and scale groups)
    vocab = P(MODEL_AXIS, None)        # embedding (V, D): shard V
    cls_vocab = P(None, MODEL_AXIS)    # classifier (D, V): shard V
    rep1 = P(None)
    rep2 = P(None, None)

    kv_ok = cfg.n_kv_heads % mp == 0
    if kv_ok:
        kv_mesh, kv_col = mesh, col
    else:
        # GQA over-sharding (mp > n_kv, mp % n_kv == 0): shard KV heads over
        # the 'kv' sub-axis, replicate within each query-head group ('rep')
        kv_mesh = gqa_submesh(mesh, cfg.n_kv_heads)
        kv_col = P(None, None, KV_AXIS)

    return LlamaParams(
        embedding=_leaf(mesh, params.embedding, vocab),
        attn_norm=NamedSharding(mesh, rep2),
        wq=_leaf(mesh, params.wq, col),
        wk=_leaf(kv_mesh, params.wk, kv_col),
        wv=_leaf(kv_mesh, params.wv, kv_col),
        wo=_leaf(mesh, params.wo, row),
        ffn_norm=NamedSharding(mesh, rep2),
        w1=_leaf(mesh, params.w1, col),
        w2=_leaf(mesh, params.w2, row),
        w3=_leaf(mesh, params.w3, col),
        out_norm=NamedSharding(mesh, rep1),
        classifier=_leaf(mesh, params.classifier, cls_vocab),
    )


def _head_axis(cfg: ModelConfig, mesh: Mesh):
    """(mesh, axis-name) for sharding the kv-heads axis: 'model' when heads
    divide, the 'kv' sub-axis (groupwise replication) when over-sharded,
    replicated otherwise."""
    mp = mesh.shape[MODEL_AXIS]
    if cfg.n_kv_heads % mp == 0:
        return mesh, MODEL_AXIS
    if mp % cfg.n_kv_heads == 0:
        return gqa_submesh(mesh, cfg.n_kv_heads), KV_AXIS
    return mesh, None


def cache_sharding(cfg: ModelConfig, mesh: Mesh, batched: bool = False) -> KVCache:
    """KV cache sharding: kv-heads over 'model' (transformer.cpp:366-374
    analogue; 'kv' sub-axis under GQA over-sharding); leading batch axis
    (if any) over 'data'."""
    hmesh, head_ax = _head_axis(cfg, mesh)
    if batched:
        spec = P(DATA_AXIS, None, head_ax, None, None)
    else:
        spec = P(None, head_ax, None, None)
    s = NamedSharding(hmesh, spec)
    return KVCache(s, s)


def slot_cache_sharding(cfg: ModelConfig, mesh: Mesh, batch_size: int):
    """Shardings for the continuous-batching cache: slots over 'data' when
    they divide, kv-heads over 'model' (or the 'kv' sub-axis for GQA
    over-sharding).  Returns (data_sharding [5D (L,B,n_kv,S,hs)],
    scale_sharding [4D (L,B,n_kv,S), int8 caches])."""
    dp = mesh.shape[DATA_AXIS]
    hmesh, head_ax = _head_axis(cfg, mesh)
    slot_ax = DATA_AXIS if dp > 1 and batch_size % dp == 0 else None
    return (NamedSharding(hmesh, P(None, slot_ax, head_ax, None, None)),
            NamedSharding(hmesh, P(None, slot_ax, head_ax, None)))


def pad_hidden_for_sharding(cfg: ModelConfig, weights: dict, model_parallel: int
                            ) -> ModelConfig:
    """Zero-pad the FFN hidden dimension so row-parallel sharding of w2 and
    its quant-group scales aligns: hidden_dim must be a multiple of
    ``group_size * model_parallel`` (e.g. LLaMA2-7B's 11008 -> 11264 on an
    8-way mesh).  Padding is exact: padded w1/w3 output rows are zero, so
    silu(0)*0 = 0 flows into zero w2 columns.  Mutates ``weights`` in place
    and returns the updated config."""
    align = cfg.group_size * model_parallel
    H = cfg.hidden_dim
    newH = -(-H // align) * align
    if newH == H:
        return cfg
    padH = newH - H

    def pad_axis(v, axis: int, n: int, scales_axis: int = None):
        if isinstance(v, tuple):
            data, scales = v
            dpad = [(0, 0)] * data.ndim
            dpad[axis] = (0, n)
            spad = [(0, 0)] * scales.ndim
            sa = axis if scales_axis is None else scales_axis
            # scales axis matching a group axis shrinks by group_size
            spad[sa] = (0, n if scales.shape[sa] == data.shape[axis]
                        else n // cfg.group_size)
            return (np.pad(data, dpad), np.pad(scales, spad))
        pad = [(0, 0)] * v.ndim
        pad[axis] = (0, n)
        return np.pad(v, pad)

    weights["w1"] = pad_axis(weights["w1"], 1, padH)   # (L, H, D): pad O rows
    weights["w3"] = pad_axis(weights["w3"], 1, padH)
    weights["w2"] = pad_axis(weights["w2"], 2, padH)   # (L, D, H): pad I cols
    return cfg.replace(hidden_dim=newH)


def shard_params(cfg: ModelConfig, mesh: Mesh, params: LlamaParams
                 ) -> LlamaParams:
    """device_put the params with TP shardings (weights flow host->devices
    once, each device receiving only its shard).  Fused params carry None
    leaves (wk/wv/w3 after fuse_params) that param_shardings has no spec
    for — map them through as None instead of letting tree_map reject the
    prefix (fused layouts are only legal on 1-device meshes, where every
    sharding is trivial anyway)."""
    shardings = param_shardings(cfg, mesh, params)
    return jax.tree.map(
        lambda v, s: None if v is None else jax.device_put(v, s),
        params, shardings, is_leaf=lambda v: v is None)


def shard_cache(cfg: ModelConfig, mesh: Mesh, cache: KVCache,
                batched: bool = False) -> KVCache:
    sh = cache_sharding(cfg, mesh, batched)
    return KVCache(jax.device_put(cache.k, sh.k), jax.device_put(cache.v, sh.v))
