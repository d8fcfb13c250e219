"""Independent numpy oracle of the reference model forward pass.

Implements the documented torch/PyG semantics (SURVEY §2.2, §3.3) directly
from a torch-schema state dict on an UNPADDED single graph — deliberately a
separate implementation from molclr_tpu.models, used to validate both the
checkpoint importer and the padded JAX models.
"""

import numpy as np

EPS_BN = 1e-5


def _bn_eval(h, state, prefix):
    w = state[f"{prefix}.weight"]
    b = state[f"{prefix}.bias"]
    rm = state[f"{prefix}.running_mean"]
    rv = state[f"{prefix}.running_var"]
    return (h - rm) / np.sqrt(rv + EPS_BN) * w + b


def _with_self_loops(n, edge_src, edge_dst, bond_type, bond_dir):
    """Append self-loop edges with bond type 4, dir 0
    (ref models/ginet_molclr.py:31-37)."""
    src = np.concatenate([edge_src, np.arange(n)])
    dst = np.concatenate([edge_dst, np.arange(n)])
    bt = np.concatenate([bond_type, np.full(n, 4)])
    bd = np.concatenate([bond_dir, np.zeros(n, dtype=int)])
    return src, dst, bt, bd


def _scatter_sum(msgs, dst, n):
    out = np.zeros((n, msgs.shape[1]), dtype=msgs.dtype)
    for e in range(msgs.shape[0]):
        out[dst[e]] += msgs[e]
    return out


def gine_conv(h, g, state, layer):
    n = h.shape[0]
    src, dst, bt, bd = _with_self_loops(n, g.edge_src, g.edge_dst,
                                        g.bond_type, g.bond_dir)
    e1 = state[f"gnns.{layer}.edge_embedding1.weight"]
    e2 = state[f"gnns.{layer}.edge_embedding2.weight"]
    e = e1[bt] + e2[bd]
    agg = _scatter_sum(h[src] + e, dst, n)
    w0 = state[f"gnns.{layer}.mlp.0.weight"]
    b0 = state[f"gnns.{layer}.mlp.0.bias"]
    w1 = state[f"gnns.{layer}.mlp.2.weight"]
    b1 = state[f"gnns.{layer}.mlp.2.bias"]
    return np.maximum(agg @ w0.T + b0, 0) @ w1.T + b1


def gcn_conv(h, g, state, layer):
    """Quirk-Q2-faithful: normalization discarded (ref gcn_molclr.py:74)."""
    n = h.shape[0]
    src, dst, bt, bd = _with_self_loops(n, g.edge_src, g.edge_dst,
                                        g.bond_type, g.bond_dir)
    e1 = state[f"gnns.{layer}.edge_embedding1.weight"][:, 0]
    e2 = state[f"gnns.{layer}.edge_embedding2.weight"][:, 0]
    e = (e1[bt] + e2[bd])[:, None]
    xw = h @ state[f"gnns.{layer}.weight"]
    agg = _scatter_sum(xw[src] + e, dst, n)
    return agg + state[f"gnns.{layer}.bias"]


def encoder_forward(g, state, gnn_type="gcn", num_layers=5, pool="mean"):
    """Returns (h_feat, z) for the pretrain net, eval mode (dropout off,
    running BN stats). g is a MolGraph."""
    h = (state["x_embedding1.weight"][g.atom_type]
         + state["x_embedding2.weight"][g.chirality])
    conv = gcn_conv if gnn_type == "gcn" else gine_conv
    for layer in range(num_layers):
        h = conv(h, g, state, layer)
        h = _bn_eval(h, state, f"batch_norms.{layer}")
        if layer != num_layers - 1:
            h = np.maximum(h, 0)
    if pool == "mean":
        hg = h.mean(axis=0)
    elif pool == "add":
        hg = h.sum(axis=0)
    else:
        hg = h.max(axis=0)
    hg = hg @ state["feat_lin.weight"].T + state["feat_lin.bias"]
    z = hg @ state["out_lin.0.weight"].T + state["out_lin.0.bias"]
    z = np.maximum(z, 0)
    z = z @ state["out_lin.2.weight"].T + state["out_lin.2.bias"]
    return hg, z


def nt_xent_reference(zis, zjs, temperature, use_cosine=True):
    """Literal transcription of the reference loss math
    (ref utils/nt_xent.py:24-65) in numpy."""
    b = zis.shape[0]
    reps = np.concatenate([zjs, zis], axis=0)
    if use_cosine:
        normed = reps / np.linalg.norm(reps, axis=1, keepdims=True)
        sim = normed @ normed.T
    else:
        sim = reps @ reps.T
    n = 2 * b
    l_pos = np.array([sim[i, i + b] for i in range(b)])
    r_pos = np.array([sim[i + b, i] for i in range(b)])
    positives = np.concatenate([l_pos, r_pos]).reshape(n, 1)
    mask = ~(np.eye(n, dtype=bool)
             | np.eye(n, k=b, dtype=bool)
             | np.eye(n, k=-b, dtype=bool))
    negatives = sim[mask].reshape(n, -1)
    logits = np.concatenate([positives, negatives], axis=1) / temperature
    # cross-entropy against class 0, summed, / 2B
    m = logits.max(axis=1, keepdims=True)
    lse = m[:, 0] + np.log(np.exp(logits - m).sum(axis=1))
    loss = (lse - logits[:, 0]).sum()
    return loss / n
