"""Checkpointing: torch-.pth importer for reference parity + Orbax-backed
native checkpoints.

The importer maps the reference torch state-dict schema (SURVEY §6.4; e.g.
ckpt/pretrained_gcn/checkpoints/model.pth) onto this framework's Flax trees.
torch Linear weights are [out, in] and are transposed to Flax [in, out]
kernels; the GCNConv `weight` parameter is already [in, out] (used as
`x @ W`, ref models/gcn_molclr.py:76) and is copied untransposed.

Partial transfer (`transfer_params`) reproduces load_my_state_dict
(ref models/ginet_finetune.py:149-157): copy intersecting paths with matching
shapes, leave the rest (fresh heads) untouched.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def load_torch_state_dict(path: str) -> dict[str, np.ndarray]:
    """Load a torch .pth state-dict to numpy without needing CUDA."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in state.items()}


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def import_torch_params(
    state: dict[str, np.ndarray],
    num_layers: int = 5,
    gnn_type: str = "gcn",
) -> tuple[dict, dict]:
    """Convert a reference state-dict into (params, batch_stats) trees whose
    structure matches MolCLRNet / FineTuneNet / MotifFineTuneNet. Only keys
    present in `state` are emitted, so the result can be transfer-merged into
    a freshly-initialized model (load_my_state_dict semantics)."""
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}

    def T(a):
        return np.ascontiguousarray(a.T)

    for key, val in state.items():
        parts = key.split(".")
        if key in ("x_embedding1.weight", "x_embedding2.weight"):
            _set(params, ["trunk", parts[0]], val)
        elif parts[0] == "gnns":
            layer = f"conv_{parts[1]}"
            rest = parts[2:]
            if rest[0] == "mlp":  # GIN: mlp.0 / mlp.2
                sub = "mlp_0" if rest[1] == "0" else "mlp_1"
                leaf = "kernel" if rest[2] == "weight" else "bias"
                _set(params, ["trunk", layer, sub, leaf],
                     T(val) if leaf == "kernel" else val)
            elif rest[0] == "weight":     # GCN x @ W: already [in, out]
                _set(params, ["trunk", layer, "weight"], val)
            elif rest[0] == "bias":
                _set(params, ["trunk", layer, "bias"], val)
            elif rest[0] in ("edge_embedding1", "edge_embedding2"):
                _set(params, ["trunk", layer, rest[0]], val)
        elif parts[0] == "batch_norms":
            layer = f"bn_{parts[1]}"
            leaf = parts[2]
            if leaf == "weight":
                _set(params, ["trunk", layer, "scale"], val)
            elif leaf == "bias":
                _set(params, ["trunk", layer, "bias"], val)
            elif leaf == "running_mean":
                _set(stats, ["trunk", layer, "mean"], val)
            elif leaf == "running_var":
                _set(stats, ["trunk", layer, "var"], val)
            # num_batches_tracked dropped
        elif parts[0] == "feat_lin":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            _set(params, ["feat_lin", leaf],
                 T(val) if leaf == "kernel" else val)
        elif parts[0] == "out_lin":       # Sequential 0 / 2
            sub = "out_lin_0" if parts[1] == "0" else "out_lin_1"
            leaf = "kernel" if parts[2] == "weight" else "bias"
            _set(params, [sub, leaf], T(val) if leaf == "kernel" else val)
        elif parts[0] == "pred_head":     # Sequential even indices
            idx = int(parts[1]) // 2
            leaf = "kernel" if parts[2] == "weight" else "bias"
            # last linear = pred_out; importer can't know the chain length
            # from one key, so use max index later via _finalize_pred_head
            _set(params, ["__pred_head__", str(idx), leaf],
                 T(val) if leaf == "kernel" else val)
        elif parts[0] == "motif_embedding":
            _set(params, ["motif_embedding"], val)
        elif parts[0] == "motif_lin":
            leaf = "kernel" if parts[1] == "weight" else "bias"
            _set(params, ["motif_lin", leaf],
                 T(val) if leaf == "kernel" else val)
        elif parts[0] == "motif_pool":    # gate_nn.0
            leaf = "kernel" if parts[-1] == "weight" else "bias"
            _set(params, ["motif_gate", leaf],
                 T(val) if leaf == "kernel" else val)

    if "__pred_head__" in params:
        chain = params.pop("__pred_head__")
        last = max(int(i) for i in chain)
        for i, leaves in chain.items():
            name = "pred_out" if int(i) == last else f"pred_{i}"
            params[name] = leaves
    return params, stats


def transfer_params(src: dict, dst: dict, stats: dict | None = None) -> dict:
    """Copy leaves of `src` into a copy of `dst` where path and shape match
    (ref models/ginet_finetune.py:149-157 load_my_state_dict).

    Pass a dict as `stats` to receive {"copied": n, "skipped": [paths]} —
    shape-mismatched or missing leaves are skipped silently otherwise, which
    can mean loading a checkpoint into the wrong architecture."""
    out = jax.tree_util.tree_map(lambda x: x, dst)  # deep-ish copy
    copied = 0
    skipped: list[str] = []

    def walk(s: dict, d: dict, prefix: str) -> None:
        nonlocal copied
        for k, v in s.items():
            path = f"{prefix}/{k}" if prefix else str(k)
            if k not in d:
                skipped.append(path)
                continue
            if isinstance(v, dict) and isinstance(d[k], dict):
                walk(v, d[k], path)
            elif not isinstance(v, dict) and not isinstance(d[k], dict):
                if tuple(np.shape(v)) == tuple(np.shape(d[k])):
                    d[k] = np.asarray(v).astype(np.asarray(d[k]).dtype)
                    copied += 1
                else:
                    skipped.append(path)

    walk(src, out, "")
    if stats is not None:
        stats["copied"] = copied
        stats["skipped"] = skipped
    return out


# ---- native (Orbax) checkpoints ----

def save_checkpoint(directory: str, step: int, tree: Any,
                    force: bool = False) -> str:
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=force)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(os.path.abspath(path), template)
    except ValueError as e:
        # Cross-platform restore (e.g. TPU-trained checkpoint opened on a
        # CPU host): the saved shardings reference devices that do not
        # exist here, so restore every leaf as plain numpy instead. Other
        # ValueErrors (e.g. template/tree mismatches) must propagate —
        # callers use them to detect weights-only checkpoints.
        if "jax.local_devices" not in str(e):
            raise
        ptc = ocp.PyTreeCheckpointer()
        if template is not None:
            # Restore INTO the template structure: a bare PyTreeCheckpointer
            # restore returns tuples/NamedTuples as lists/dicts, which
            # mangles e.g. an optax opt_state (first tx.update would fail
            # with 'dict' has no attribute 'mu'). item=template keeps the
            # original container types; a saved-tree/template mismatch
            # raises and propagates, which callers use to detect
            # weights-only checkpoints.
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), template)
            return ptc.restore(os.path.abspath(path), item=template,
                               restore_args=restore_args)
        meta = ptc.metadata(os.path.abspath(path)).item_metadata
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
            meta.tree if hasattr(meta, "tree") else meta)
        return ptc.restore(os.path.abspath(path),
                           restore_args=restore_args)


def resolve_pretrained(path: str) -> str:
    """Resolve a warm-start spec to a loadable checkpoint path.

    Accepts everything the reference's `fine_tune_from` key does
    (finetune.py:249: a bare name is `./ckpt/<name>/checkpoints/model.pth`)
    plus our own layouts: an explicit .pth file, an Orbax step directory,
    or a directory containing either.
    """
    if not path:
        return path
    candidates = [
        path,
        os.path.join(path, "checkpoints", "model.pth"),
        os.path.join("ckpt", path, "checkpoints", "model.pth"),
    ]
    for cand in candidates:
        if os.path.exists(cand):
            if os.path.isdir(cand):
                latest = latest_checkpoint(cand)
                if latest is not None:
                    return latest
            return cand
    return path


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                continue
    if not steps:
        return None
    return os.path.join(directory, f"step_{max(steps)}")
