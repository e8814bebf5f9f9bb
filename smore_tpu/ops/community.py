"""Community / CBOW / choice-family update kernels.

Covers the reference kernels that aggregate multiple rows per sample:
  - UpdateCBOW (proNet.cpp:2868-3003): neighbor-SUM CBOW used by GCN and
    TextGCN (the /= num average is commented out in the reference, so the
    aggregation really is a sum).
  - UpdateDChoice (proNet.cpp:2221-2406, live branch): ECO's softmax
    choice over {1-hop context (weight 2), 3-hop context (weight 1),
    negatives}.
  - UpdateFieldCommunity (proNet.cpp:3181-3259): FINE's field-projected
    SGNS along a context walk (shadow row = vid * n_fields + fid).
  - UpdateMSFieldCommunity (proNet.cpp:3261-3308): msFINE's variant --
    vertex side projected, context side plain, reg=0.025.

All kernels are batched: B samples per call, fixed shapes, masks for
dead-end walk truncation, scatter-add write-back (collision="sum" matches
hogwild gradient mass; see ops/update.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from smore_tpu.ops.update import scatter_apply


def cbow_step(
    w: jnp.ndarray,  # (N, D) -- the single table UpdateCBOW touches
    vctx: jnp.ndarray,  # (B, S) neighbor draws of the vertex side
    cctx: jnp.ndarray,  # (B, S) neighbor draws of the context side
    neg_sets: jnp.ndarray,  # (B, K, S) random field-matched sets
    alpha: jnp.ndarray,
    reg: float = 0.01,
    mask: Optional[jnp.ndarray] = None,  # (B,)
    collision: str = "sum",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched UpdateCBOW. w_avg = SUM of vctx rows, c_avg = SUM of cctx
    rows; positive sigmoid step on (w_avg . c_avg) updates the cctx rows
    immediately-in-reference (here: same-batch scatter); each of K
    negative sets plays the context role with label 0; vctx rows receive
    the accumulated vertex-side error."""
    B, S = vctx.shape
    K = neg_sets.shape[1]
    m1 = 1.0 if mask is None else mask[:, None]

    wa = jnp.sum(w.at[vctx].get(mode="promise_in_bounds"), axis=1)  # (B,D)
    ca = jnp.sum(w.at[cctx].get(mode="promise_in_bounds"), axis=1)  # (B,D)
    na = jnp.sum(
        w.at[neg_sets].get(mode="promise_in_bounds"), axis=2
    )  # (B,K,D)

    f_pos = jnp.einsum("bd,bd->b", wa, ca)
    g_pos = (1.0 - jax.nn.sigmoid(f_pos))  # label 1, NOT yet alpha-scaled
    f_neg = jnp.einsum("bd,bkd->bk", wa, na)
    g_neg = -jax.nn.sigmoid(f_neg)
    if mask is not None:
        g_pos = g_pos * mask
        g_neg = g_neg * mask[:, None]

    # vertex-side error: alpha * (g*c_avg - reg*w_avg) per Opt call
    d_w = alpha * (
        g_pos[:, None] * ca
        + jnp.einsum("bk,bkd->bd", g_neg, na)
        - reg * (1 + K) * wa * m1
    )
    # context-side errors (applied to each member of the set)
    d_c = alpha * (g_pos[:, None] * wa - reg * ca * m1)  # (B, D)
    m2 = 1.0 if mask is None else mask[:, None, None]
    d_n = alpha * (g_neg[:, :, None] * wa[:, None, :] - reg * na * m2)  # (B,K,D)

    rep = lambda x, s: jnp.broadcast_to(x[:, None, :], (B, s, x.shape[-1]))
    mask_s = None if mask is None else jnp.repeat(mask, S)
    mask_ks = None if mask is None else jnp.repeat(mask, K * S)
    w = scatter_apply(
        w,
        [
            (vctx.reshape(-1), rep(d_w, S).reshape(B * S, -1), mask_s),
            (cctx.reshape(-1), rep(d_c, S).reshape(B * S, -1), mask_s),
            (
                neg_sets.reshape(-1),
                jnp.broadcast_to(
                    d_n[:, :, None, :], (B, K, S, d_n.shape[-1])
                ).reshape(B * K * S, -1),
                mask_ks,
            ),
        ],
        collision,
    )
    eps = 1e-7
    loss = -jnp.log(jax.nn.sigmoid(f_pos) + eps).mean() - jnp.log(
        1 - jax.nn.sigmoid(f_neg) + eps
    ).sum(-1).mean()
    return w, loss


def dchoice_step(
    w: jnp.ndarray,
    vertex: jnp.ndarray,  # (B,)
    c1: jnp.ndarray,  # (B,) 1-hop context
    c2: jnp.ndarray,  # (B,) 3-hop context
    negs: jnp.ndarray,  # (B, K)
    alpha: jnp.ndarray,
    reg: float = 0.01,
    collision: str = "sum",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched UpdateDChoice (ECO): softmax over {c1 (x2), c2, negs}."""
    v = w.at[vertex].get(mode="promise_in_bounds")
    w1 = w.at[c1].get(mode="promise_in_bounds")
    w2 = w.at[c2].get(mode="promise_in_bounds")
    wn = w.at[negs].get(mode="promise_in_bounds")  # (B,K,D)

    e1 = jnp.exp(jnp.einsum("bd,bd->b", v, w1))
    e2 = jnp.exp(jnp.einsum("bd,bd->b", v, w2))
    en = jnp.exp(jnp.einsum("bd,bkd->bk", v, wn))
    z_pos = 2.0 * e1 + e2
    z = e1 + e2 + en.sum(-1)

    dev = (
        w1 * e1[:, None]
        + w2 * e2[:, None]
        + jnp.einsum("bk,bkd->bd", en, wn)
    )
    d_v = alpha * (
        (2.0 * w1 * e1[:, None] + w2 * e2[:, None]) / z_pos[:, None]
        - dev / z[:, None]
        - reg * v
    )
    d_c1 = alpha * (
        (2.0 * v * e1[:, None]) / z_pos[:, None]
        - (v * e1[:, None]) / z[:, None]
        - reg * w1
    )
    d_c2 = alpha * (
        (v * e2[:, None]) / z_pos[:, None]
        - (v * e2[:, None]) / z[:, None]
        - reg * w2
    )
    d_n = -alpha * (
        v[:, None, :] * en[..., None] / z[:, None, None] + reg * wn
    )

    B, K, D = d_n.shape
    w = scatter_apply(
        w,
        [
            (vertex, d_v),
            (c1, d_c1),
            (c2, d_c2),
            (negs.reshape(-1), d_n.reshape(B * K, D)),
        ],
        collision,
    )
    loss = -jnp.log(jnp.clip(z_pos / (2.0 * z), 1e-9, None)).mean()
    return w, loss


def field_project(vids: jnp.ndarray, fids: jnp.ndarray, n_fields: int):
    """Shadow row index for (vertex, field): vid * n_fields + fid.
    The reference materializes these as MAX_fvid extra rows
    (proNet.cpp:389-406); here it's pure index arithmetic."""
    return vids * n_fields + fids


def field_community_step(
    w_vertex: jnp.ndarray,  # (N * F, D) shadow vertex table
    w_context: jnp.ndarray,  # (N * F, D) shadow context table
    vertex: jnp.ndarray,  # (B,) plain vids
    ctx_walk: jnp.ndarray,  # (B, S) plain context walk (pos + extensions)
    walk_mask: jnp.ndarray,  # (B, S)
    negs: jnp.ndarray,  # (B, S, K) plain negative vids, field-matched to ctx
    fields_of: jnp.ndarray,  # (N,) field id per vertex
    n_fields: int,
    alpha: jnp.ndarray,
    reg: float = 0.0,
    ms_variant: bool = False,  # msFINE: plain context rows + reg 0.025
    collision: str = "sum",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched UpdateFieldCommunity / UpdateMSFieldCommunity."""
    B, S = ctx_walk.shape
    K = negs.shape[2]
    v_fid = fields_of.at[vertex].get(mode="promise_in_bounds")  # (B,)
    c_fid = fields_of.at[ctx_walk].get(mode="promise_in_bounds")  # (B,S)

    # vertex row projected by the CONTEXT's field, per walk position
    v_rows = field_project(vertex[:, None], c_fid, n_fields)  # (B,S)
    if ms_variant:
        # msFINE uses the PLAIN context row; in the reference's shadow
        # scheme field[vid].vids[own_field] == vid, so the plain row is
        # the own-field projection under the vid*F+fid layout.
        c_rows = field_project(ctx_walk, c_fid, n_fields)
        n_fid = fields_of.at[negs].get(mode="promise_in_bounds")
        n_rows = field_project(negs, n_fid, n_fields)
        reg = 0.025
    else:
        # context row projected by the VERTEX's field
        c_rows = field_project(ctx_walk, v_fid[:, None], n_fields)
        n_rows = field_project(negs, v_fid[:, None, None], n_fields)

    v = w_vertex.at[v_rows].get(mode="promise_in_bounds")  # (B,S,D)
    c = w_context.at[c_rows].get(mode="promise_in_bounds")  # (B,S,D)
    n = w_context.at[n_rows].get(mode="promise_in_bounds")  # (B,S,K,D)

    g_pos = (1.0 - jax.nn.sigmoid(jnp.einsum("bsd,bsd->bs", v, c)))
    g_neg = -jax.nn.sigmoid(jnp.einsum("bsd,bskd->bsk", v, n))
    g_pos = g_pos * walk_mask
    g_neg = g_neg * walk_mask[..., None]

    m2 = walk_mask[..., None]
    d_v = alpha * (
        g_pos[..., None] * c
        + jnp.einsum("bsk,bskd->bsd", g_neg, n)
        - reg * (1 + K) * v * m2
    )
    d_c = alpha * (g_pos[..., None] * v - reg * c * m2)
    d_n = alpha * (g_neg[..., None] * v[:, :, None, :] - reg * n * m2[..., None])

    D = d_v.shape[-1]
    mask_s = walk_mask.reshape(-1)
    mask_sk = jnp.repeat(mask_s, K)
    w_context = scatter_apply(
        w_context,
        [
            (c_rows.reshape(-1), d_c.reshape(B * S, D), mask_s),
            (n_rows.reshape(-1), d_n.reshape(B * S * K, D), mask_sk),
        ],
        collision,
    )
    w_vertex = scatter_apply(
        w_vertex, [(v_rows.reshape(-1), d_v.reshape(B * S, D), mask_s)],
        collision,
    )
    denom = jnp.maximum(walk_mask.sum(), 1.0)
    loss = jnp.sum(-jnp.log(jax.nn.sigmoid(
        jnp.einsum("bsd,bsd->bs", v, c)) + 1e-7) * walk_mask) / denom
    return w_vertex, w_context, loss
