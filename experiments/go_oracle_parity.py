"""Reference-semantics oracle arms for the Go-only model families.

No Go toolchain exists in this image (VERDICT r2 "Missing #1"), so —
following the pattern of experiments/sasrec_eval.py — each Go-only model
gets a faithful sequential NumPy arm implementing the reference's exact
update semantics (per-sample hogwild-style writes, same init laws, same
negative laws, same schedules), and we run matched-budget head-to-heads
against our TPU implementations with ONE shared eval per family.

Oracle provenance (semantics transcribed, not code):
  transe  /root/reference/internal/models/transe/transe.go:102-121 (score),
          :180-232 (train loop, corrupt head-or-tail, epoch renorm),
          :235-284 (manual gradient: raw h+r-t for L2, sign for L1)
  rotate  rotate.go:46-113 (phase init, ||h o r - t||), :180-250
          (self-adversarial weight exp(-negScore/T), normalized grad,
          conj-rotation chain rule, relation renorm per epoch)
  complex complex.go:85-117 (trilinear score, entity renorm), :120-156
          (analytic gradients), :240-252 (margin on neg-pos, both
          triples updated on violation)
  sne     sne.go:107-319 (epoch = all pos edges then all neg edges,
          shuffled; sigmoid pulls for +, beta-weighted pushes for -,
          uniform-vertex negative sampling with skip rules)
  ctdne   ctdne.go:100-211 (per-node time-increasing walk from a random
          start time, activity^0.75 negative table, skip-gram)
  metapath2vec  metapath2vec.go:106-316 (per-node metapath walk,
          uniform^0.75 negatives, skip-gram)
  shared  pkg/pronet/optimizer.go:8-58 (UpdatePair: SGNS, deferred
          vertex write), pronet.go:90-109 (1000-bin sigmoid LUT over
          [-8, 8]), pkg/temporal/temporal_graph.go:225-251,
          pkg/hetero/hetero_graph.go:221-257, pronet.go:310-333
          (SkipGrams WITHOUT window shrink)

Run:  python experiments/go_oracle_parity.py [transe rotate complex sne
      ctdne metapath2vec]   (ours on TPU, oracles on host CPU)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

if os.environ.get("ORACLE_CPU", "1") != "0":
    # JAX_PLATFORMS=cpu is stomped by the axon plugin; the config update
    # after import is the working override (verify skill gotchas). The
    # matched-budget QUALITY comparison doesn't need TPU speed, and
    # keeping these arms off the tunnel avoids contending with benches.
    import jax

    jax.config.update("jax_platforms", "cpu")

DIM = 32
SEED = 5


# ===================================================================== #
# shared: Go fastSigmoid LUT (pronet.go:90-109 / proNet.cpp:52-71)
# ===================================================================== #
_SIG_TABLE = 1.0 / (1.0 + np.exp(-(np.arange(1000) / 999.0 * 16.0 - 8.0)))


def fast_sigmoid(x: float) -> float:
    if x > 8.0:
        return 1.0
    if x < -8.0:
        return 0.0
    return _SIG_TABLE[int((x + 8.0) / 16.0 * 999.0)]


# ===================================================================== #
# datasets (seeded synthetics shaped for each family's structure)
# ===================================================================== #
def make_kg(path, n_clusters=12, per=100, n_rel=6, triples_per_rel=3500):
    """Entities in clusters; relation r links cluster c -> (c+r+1)%12.
    A model that learns the relational geometry ranks true tails high."""
    rng = np.random.default_rng(SEED)
    lines = []
    for r in range(n_rel):
        h = rng.integers(0, n_clusters * per, triples_per_rel)
        hc = h // per
        tc = (hc + r + 1) % n_clusters
        t = tc * per + rng.integers(0, per, triples_per_rel)
        for hh, tt in zip(h, t):
            lines.append(f"e{hh} r{r} e{tt}\n")
    with open(path, "w") as f:
        f.writelines(lines)
    return path


def make_signed(path, camps=3, per=400, pos_e=24000, neg_e=8000):
    rng = np.random.default_rng(SEED)
    n = camps * per
    lines = []
    for _ in range(pos_e):
        c = rng.integers(0, camps)
        a, b = c * per + rng.integers(0, per, 2)
        if a != b:
            lines.append(f"v{a} v{b} +1\n")
    for _ in range(neg_e):
        c1 = rng.integers(0, camps)
        c2 = (c1 + 1 + rng.integers(0, camps - 1)) % camps
        a = c1 * per + rng.integers(0, per)
        b = c2 * per + rng.integers(0, per)
        lines.append(f"v{a} v{b} -1\n")
    with open(path, "w") as f:
        f.writelines(lines)
    return path


def make_temporal(path, comms=4, per=150, edges=20000, horizon=100.0):
    """Intra-community edges spread over [0, horizon); walks that follow
    time stay inside a community."""
    rng = np.random.default_rng(SEED)
    lines = []
    for _ in range(edges):
        c = rng.integers(0, comms)
        a, b = c * per + rng.integers(0, per, 2)
        if a == b:
            continue
        t = rng.random() * horizon
        lines.append(f"n{a} n{b} {t:.3f}\n")
    with open(path, "w") as f:
        f.writelines(lines)
    return path


def make_hetero(path, topics=6, authors_pt=80, papers_pt=120, venues_pt=2):
    """Author-paper-venue per topic; APA walks stay intra-topic."""
    rng = np.random.default_rng(SEED)
    lines = []
    for c in range(topics):
        for a in range(authors_pt):
            an = f"a{c * authors_pt + a}"
            for p in rng.choice(papers_pt, 5, replace=False):
                lines.append(
                    f"{an} author p{c * papers_pt + p} paper writes\n"
                )
        for p in range(papers_pt):
            v = c * venues_pt + rng.integers(0, venues_pt)
            lines.append(
                f"p{c * papers_pt + p} paper v{v} venue published_at\n"
            )
    with open(path, "w") as f:
        f.writelines(lines)
    return path


# ===================================================================== #
# shared evals
# ===================================================================== #
def kg_rank_eval(score_batch, heads, rels, tails, n_entities, n_neg=50,
                 n_test=1000, seed=0):
    """MRR + hits@3 of the true triple vs n_neg uniform corrupted heads.
    score_batch(h, r, t) -> HIGHER = better (arm adapts sign)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(heads), min(n_test, len(heads)), replace=False)
    h, r, t = heads[idx], rels[idx], tails[idx]
    correct = score_batch(h, r, t)
    better = np.zeros(len(idx))
    for _ in range(n_neg):
        nh = rng.integers(0, n_entities, len(idx))
        better += (correct > score_batch(nh, r, t)).astype(np.float64)
    rank = n_neg - better + 1
    return float((1.0 / rank).mean()), float((rank <= 3).mean())


def auc(pos, neg):
    pos, neg = np.asarray(pos), np.asarray(neg)
    return float((pos[:, None] > neg[None, :]).mean()
                 + 0.5 * (pos[:, None] == neg[None, :]).mean())


def community_auc_emb(emb, labels, n_pairs=20000, seed=0):
    x = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
    rng = np.random.default_rng(seed)
    a = rng.integers(0, len(x), n_pairs * 3)
    b = rng.integers(0, len(x), n_pairs * 3)
    same = labels[a] == labels[b]
    s = (x[a] * x[b]).sum(1)
    return auc(s[same][:n_pairs], s[~same][:n_pairs][:2000])


# ===================================================================== #
# KG oracles (sequential per-triple SGD, float64)
# ===================================================================== #
def _kg_arrays(path):
    from smore_tpu.graph.knowledge import KnowledgeGraph
    kg = KnowledgeGraph.load_triples(path)
    return kg


def _corrupt(kg, rng, h, r, t):
    """Per-relation entity pool corruption (knowledge_graph.go:185-212)."""
    pool = kg.rel_entities[kg.rel_indptr[r]:kg.rel_indptr[r + 1]]
    c = pool[rng.integers(0, len(pool))]
    if rng.random() < 0.5:
        return c, t
    return h, c


def oracle_transe(kg, epochs, alpha, margin=1.0, norm=2):
    rng = np.random.default_rng(SEED + 1)
    n, m = kg.n_entities, kg.n_relations
    ent = rng.uniform(-6 / np.sqrt(DIM), 6 / np.sqrt(DIM), (n, DIM))
    ent /= np.linalg.norm(ent, axis=1, keepdims=True)
    rel = rng.uniform(-6 / np.sqrt(DIM), 6 / np.sqrt(DIM), (m, DIM))
    H, R, T = kg.heads, kg.relations, kg.tails
    for _ in range(epochs):
        for i in rng.permutation(len(H)):
            h, r, t = H[i], R[i], T[i]
            nh, nt = _corrupt(kg, rng, h, r, t)
            pd = ent[h] + rel[r] - ent[t]
            nd = ent[nh] + rel[r] - ent[nt]
            ps = np.abs(pd).sum() if norm == 1 else np.sqrt(pd @ pd)
            ns = np.abs(nd).sum() if norm == 1 else np.sqrt(nd @ nd)
            if margin + ps - ns > 0:
                g_p = np.sign(pd) if norm == 1 else pd  # transe.go:262-270
                g_n = np.sign(nd) if norm == 1 else nd
                ent[h] -= alpha * g_p
                rel[r] -= alpha * g_p
                ent[t] += alpha * g_p
                ent[nh] += alpha * g_n
                rel[r] += alpha * g_n
                ent[nt] -= alpha * g_n
        ent /= np.maximum(np.linalg.norm(ent, axis=1, keepdims=True), 1e-12)
    return ent, rel


def oracle_rotate(kg, epochs, alpha, margin=6.0, temp=1.0):
    rng = np.random.default_rng(SEED + 2)
    n, m = kg.n_entities, kg.n_relations
    cd = DIM // 2
    phase = rng.random((n, cd)) * 2 * np.pi
    mag = (rng.random((n, cd)) * 0.5 + 0.5) / cd
    ent = mag * np.exp(1j * phase)  # rotate.go:70-82
    rel = np.exp(1j * rng.random((m, cd)) * 2 * np.pi)
    H, R, T = kg.heads, kg.relations, kg.tails

    def score(h, r, t):
        d = ent[h] * rel[r] - ent[t]
        return np.sqrt((d.real ** 2 + d.imag ** 2).sum())

    for _ in range(epochs):
        for i in rng.permutation(len(H)):
            h, r, t = H[i], R[i], T[i]
            nh, nt = _corrupt(kg, rng, h, r, t)
            ps, ns = score(h, r, t), score(nh, R[i], nt)
            w = np.exp(-ns / temp) if temp > 0 else 1.0
            if margin + ps - ns > 0:
                for (hh, tt, lr) in ((h, t, alpha), (nh, nt, -alpha * w)):
                    d = ent[hh] * rel[r] - ent[tt]
                    nrm = np.abs(d)
                    g = np.where(nrm > 1e-10, d / np.maximum(nrm, 1e-10), 0)
                    ent[hh] -= lr * g * np.conj(rel[r])
                    rel[r] -= lr * g * np.conj(ent[hh])
                    ent[tt] += lr * g
        rel /= np.maximum(np.abs(rel), 1e-12)  # unit rotations per epoch
    return ent, rel


def oracle_complex(kg, epochs, alpha, margin=1.0, negs=10):
    rng = np.random.default_rng(SEED + 3)
    n, m = kg.n_entities, kg.n_relations
    cd = DIM // 2
    s = 6 / np.sqrt(cd)
    ent = rng.uniform(-s, s, (n, cd)) + 1j * rng.uniform(-s, s, (n, cd))
    ent /= np.maximum(
        np.sqrt((ent.real ** 2 + ent.imag ** 2).sum(1, keepdims=True)),
        1e-12,
    )
    rel = rng.uniform(-s, s, (m, cd)) + 1j * rng.uniform(-s, s, (m, cd))
    H, R, T = kg.heads, kg.relations, kg.tails

    def score(h, r, t):
        return (ent[h] * rel[r] * np.conj(ent[t])).real.sum()

    def renorm(e):
        nrm = np.sqrt((ent[e].real ** 2 + ent[e].imag ** 2).sum())
        if nrm > 0:
            ent[e] /= nrm

    for _ in range(epochs):
        for i in rng.permutation(len(H)):
            h, r, t = H[i], R[i], T[i]
            ps = score(h, r, t)
            # complex.go:225-252: negativeSamples (CLI default 10) fresh
            # corruptions per positive, both triples updated on violation
            for _ in range(negs):
                nh, nt = _corrupt(kg, rng, h, r, t)
                ns = score(nh, r, nt)
                if margin + ns - ps > 0:
                    for (hh, tt, sgn) in ((h, t, -1.0), (nh, nt, 1.0)):
                        gh = rel[r] * np.conj(ent[tt])
                        gr = ent[hh] * np.conj(ent[tt])
                        gt = np.conj(ent[hh] * rel[r])
                        ent[hh] -= alpha * sgn * gh
                        rel[r] -= alpha * sgn * gr
                        ent[tt] -= alpha * sgn * gt
                        renorm(hh)
                        renorm(tt)
                    ps = score(h, r, t)
    return ent, rel


# ===================================================================== #
# SNE oracle
# ===================================================================== #
def oracle_sne(net, epochs, samples_per_edge, alpha, beta, negs):
    rng = np.random.default_rng(SEED + 4)
    n = net.n_vertices
    src_t = (rng.random((n, DIM)) - 0.5) / DIM
    tgt_t = (rng.random((n, DIM)) - 0.5) / DIM
    pos = np.stack([net.pos_src, net.pos_dst], 1)
    neg = np.stack([net.neg_src, net.neg_dst], 1)
    neg_sets = {}
    for a, b in neg:
        neg_sets.setdefault(a, set()).add(b)
    total = epochs * samples_per_edge * (len(pos) + len(neg))
    count = 0
    cur = alpha
    for _ in range(epochs):
        for positive, edges in ((True, pos), (False, neg)):
            for i in rng.permutation(len(edges)):
                f, t = edges[i]
                for _ in range(samples_per_edge):
                    if positive:  # sne.go:238-278
                        g = cur * (1.0 - fast_sigmoid(src_t[f] @ tgt_t[t]))
                        src_t[f], tgt_t[t] = (
                            src_t[f] + g * tgt_t[t],
                            tgt_t[t] + g * src_t[f],
                        )
                        for _ in range(negs):
                            v = rng.integers(0, n)
                            if v == t:
                                continue
                            gn = cur * (0.0 - fast_sigmoid(
                                src_t[f] @ tgt_t[v]))
                            src_t[f], tgt_t[v] = (
                                src_t[f] + gn * tgt_t[v],
                                tgt_t[v] + gn * src_t[f],
                            )
                    else:  # sne.go:281-319
                        g = cur * beta * (
                            0.0 - fast_sigmoid(src_t[f] @ tgt_t[t]))
                        src_t[f], tgt_t[t] = (
                            src_t[f] + g * tgt_t[t],
                            tgt_t[t] + g * src_t[f],
                        )
                        for _ in range(negs):
                            v = rng.integers(0, n)
                            if v == t or v in neg_sets.get(f, ()):
                                continue
                            gn = cur * beta * (1.0 - fast_sigmoid(
                                src_t[f] @ tgt_t[v]))
                            src_t[f], tgt_t[v] = (
                                src_t[f] + gn * tgt_t[v],
                                tgt_t[v] + gn * src_t[f],
                            )
                    count += 1
                    if count % 10000 == 0:
                        cur = max(alpha * (1 - count / total), alpha * 1e-4)
    return src_t, tgt_t


# ===================================================================== #
# walk-family oracles (skip-gram WITHOUT window shrink, UpdatePair SGNS)
# ===================================================================== #
def _update_pair(wv, wc, v, c, negs_draw, n_negs, alpha):
    """pkg/pronet/optimizer.go:8-58 -- deferred vertex/context write."""
    vg = np.zeros(wv.shape[1])
    cg = np.zeros(wv.shape[1])
    g = alpha * (1.0 - fast_sigmoid(wv[v] @ wc[c]))
    vg += g * wc[c]
    cg += g * wv[v]
    for _ in range(n_negs):
        s = negs_draw()
        if s == c:
            continue
        gn = alpha * (0.0 - fast_sigmoid(wv[v] @ wc[s]))
        vg += gn * wc[s]
        wc[s] += gn * wv[v]
    wv[v] += vg
    wc[c] += cg


def _skipgrams(walk, window):
    out = []
    for i in range(len(walk)):
        for j in range(max(0, i - window), min(len(walk), i + window + 1)):
            if i != j:
                out.append((walk[i], walk[j]))
    return out


def _alias_draw_factory(mass, power, rng):
    from smore_tpu.sampling.alias import build_alias
    p, a = build_alias(np.asarray(mass, np.float64), power=power)
    a = np.where(a < 0, np.arange(len(mass)), a)

    def draw():
        i = rng.integers(0, len(mass))
        return i if rng.random() < p[i] else int(a[i])

    return draw


def oracle_ctdne(tg, walk_times, walk_steps, window, negs, alpha,
                 time_window):
    rng = np.random.default_rng(SEED + 5)
    n = tg.n_vertices
    wv = (rng.random((n, DIM)) - 0.5) / DIM
    wc = np.zeros((n, DIM))
    activity = np.maximum(np.diff(tg.indptr), 1).astype(np.float64)
    neg_draw = _alias_draw_factory(activity, 0.75, rng)
    total = walk_times * n
    count = 0
    cur = alpha
    for _ in range(walk_times):
        for v in rng.permutation(n):
            lo, hi = tg.indptr[v], tg.indptr[v + 1]
            count += 1
            if hi == lo:
                continue
            tmin, tmax = tg.active_min[v], tg.active_max[v]
            t0 = tmin + rng.random() * max(tmax - tmin, time_window)
            walk, cur_v, cur_t = [v], v, t0
            for _ in range(walk_steps):
                # time-increasing neighbor in (cur_t, cur_t+window]
                lo2, hi2 = tg.indptr[cur_v], tg.indptr[cur_v + 1]
                ts = tg.edge_ts[lo2:hi2]
                ok = np.flatnonzero(
                    (ts > cur_t) & (ts <= cur_t + time_window))
                if len(ok) == 0:
                    break
                j = ok[rng.integers(0, len(ok))]
                cur_v = int(tg.edge_dst[lo2 + j])
                cur_t = float(ts[j])
                walk.append(cur_v)
            for a, b in _skipgrams(walk, window):
                _update_pair(wv, wc, a, b, neg_draw, negs, cur)
            if count % 1000 == 0:
                cur = max(alpha * (1 - count / total), alpha * 1e-4)
    return wv


def oracle_metapath2vec(hg, meta_path, walk_times, walk_steps, window,
                        negs, alpha):
    rng = np.random.default_rng(SEED + 6)
    n = hg.n_vertices
    wv = (rng.random((n, DIM)) - 0.5) / DIM
    wc = np.zeros((n, DIM))
    neg_draw = _alias_draw_factory(np.ones(n), 0.75, rng)
    total = walk_times * n
    count = 0
    cur = alpha
    path_ids = [hg.type2id[t] for t in meta_path]
    for _ in range(walk_times):
        for v in rng.permutation(n):
            count += 1
            walk, cur_v, pi = [v], v, 0
            for _ in range(walk_steps):
                if hg.node_type[cur_v] != path_ids[pi % len(path_ids)]:
                    break
                want = meta_path[(pi + 1) % len(path_ids)]
                nbrs = hg.neighbors_by_type(cur_v, want)
                if len(nbrs) == 0:
                    break
                cur_v = int(nbrs[rng.integers(0, len(nbrs))])
                walk.append(cur_v)
                pi += 1
            if len(walk) > 1:
                for a, b in _skipgrams(walk, window):
                    _update_pair(wv, wc, a, b, neg_draw, negs, cur)
            if count % 1000 == 0:
                cur = max(alpha * (1 - count / total), alpha * 1e-4)
    return wv


# ===================================================================== #
# head-to-heads
# ===================================================================== #
def run_kg(which):
    from smore_tpu.models.kg import ComplEx, RotatE, TransE

    path = make_kg("/tmp/oracle_kg.txt")
    kg = _kg_arrays(path)
    epochs, alpha = 30, 0.01
    print(f"[{which}] {kg.n_triples} triples, {kg.n_entities} entities, "
          f"epochs={epochs}", flush=True)

    # Dim convention: Go's rotate/complex "dim" counts TOTAL real dims
    # (complex dim = dim/2, rotate.go:50); OUR RotatE/ComplEx init(dim)
    # takes the COMPLEX dim (entities are (N, 2*dim) re|im). Matched
    # arms therefore use cdim complex dims on both sides.
    cdim = DIM // 2
    t0 = time.time()
    if which == "transe":
        oe, orl = oracle_transe(kg, epochs, alpha)
        osc = lambda h, r, t: -np.linalg.norm(  # noqa: E731
            oe[h] + orl[r] - oe[t], axis=-1)
        ours = TransE(kg, seed=0)
    elif which == "rotate":
        oe, orl = oracle_rotate(kg, epochs, alpha)
        osc = lambda h, r, t: -np.sqrt(  # noqa: E731
            (np.abs(oe[h] * orl[r] - oe[t]) ** 2).sum(-1))
        ours = RotatE(kg, seed=0)
    else:
        # matched (triple, corruption) budgets: ours draws 1 corruption
        # per triple per epoch; the Go loop draws negativeSamples=10
        oe, orl = oracle_complex(kg, max(3, epochs // 10), alpha)
        osc = lambda h, r, t: (  # noqa: E731
            oe[h] * orl[r] * np.conj(oe[t])).real.sum(-1)
        ours = ComplEx(kg, seed=0)
    t_oracle = time.time() - t0
    o_mrr, o_h3 = kg_rank_eval(osc, kg.heads, kg.relations, kg.tails,
                               kg.n_entities)

    t0 = time.time()
    ours.init(dim=DIM if which == "transe" else cdim)
    ours.train(epochs=epochs, batch=1024, alpha=alpha, verbose=False)
    t_ours = time.time() - t0
    st = {k: np.asarray(v) for k, v in ours.state.items()}

    if which == "transe":
        e, rl = st["entity"], st["relation"]
        usc = lambda h, r, t: -np.linalg.norm(  # noqa: E731
            e[h] + rl[r] - e[t], axis=-1)
    elif which == "rotate":
        e, ph = st["entity"], st["relation"]

        def usc(h, r, t):
            hr, hi = e[h][:, :cdim], e[h][:, cdim:]
            tr, ti = e[t][:, :cdim], e[t][:, cdim:]
            cr, ci = np.cos(ph[r]), np.sin(ph[r])
            dr = hr * cr - hi * ci - tr
            di = hr * ci + hi * cr - ti
            return -np.sqrt((dr * dr + di * di).sum(-1))
    else:
        e, rl = st["entity"], st["relation"]

        def usc(h, r, t):
            hr, hi = e[h][:, :cdim], e[h][:, cdim:]
            tr, ti = e[t][:, :cdim], e[t][:, cdim:]
            rr, ri = rl[r][:, :cdim], rl[r][:, cdim:]
            return ((hr * rr - hi * ri) * tr
                    + (hr * ri + hi * rr) * ti).sum(-1)

    u_mrr, u_h3 = kg_rank_eval(usc, kg.heads, kg.relations, kg.tails,
                               kg.n_entities)
    print(f"{which:14s} ours MRR={u_mrr:.4f} hits@3={u_h3:.4f} "
          f"({t_ours:.0f}s) | oracle MRR={o_mrr:.4f} hits@3={o_h3:.4f} "
          f"({t_oracle:.0f}s)", flush=True)
    return which, u_mrr, o_mrr, u_h3, o_h3


def run_sne():
    from smore_tpu.graph.signed import SignedNetwork
    from smore_tpu.models.sne import SNE

    path = make_signed("/tmp/oracle_signed.txt")
    net = SignedNetwork.load_edge_list(path, undirected=False)
    epochs, spe, alpha, beta, negs = 8, 1, 0.025, 1.0, 5
    print(f"[sne] {net.n_vertices} vertices, {len(net.pos_src)}+ / "
          f"{len(net.neg_src)}- edges, epochs={epochs}", flush=True)

    t0 = time.time()
    o_src, o_tgt = oracle_sne(net, epochs, spe, alpha, beta, negs)
    t_oracle = time.time() - t0
    o_auc = auc((o_src[net.pos_src] * o_tgt[net.pos_dst]).sum(1),
                (o_src[net.neg_src] * o_tgt[net.neg_dst]).sum(1))

    t0 = time.time()
    m = SNE(net, seed=0, beta=beta, negative_samples=negs)
    m.init(dim=DIM)
    m.train(epochs=epochs, samples_per_edge=spe, alpha=alpha,
            verbose=False)
    t_ours = time.time() - t0
    s, t = np.asarray(m.state["source"]), np.asarray(m.state["target"])
    u_auc = auc((s[net.pos_src] * t[net.pos_dst]).sum(1),
                (s[net.neg_src] * t[net.neg_dst]).sum(1))
    print(f"{'sne':14s} ours sign-AUC={u_auc:.4f} ({t_ours:.0f}s) | "
          f"oracle {o_auc:.4f} ({t_oracle:.0f}s)", flush=True)
    return "sne", u_auc, o_auc, None, None


def run_ctdne():
    from smore_tpu.graph.temporal import TemporalGraph
    from smore_tpu.models.ctdne import CTDNE

    path = make_temporal("/tmp/oracle_temporal.txt")
    tg = TemporalGraph.load_edge_list(path)
    wt, ws, win, negs, alpha, tw = 16, 20, 5, 5, 0.025, 20.0
    labels_by_vid = np.array(
        [int(nm[1:]) // 150 for nm in tg.names])
    print(f"[ctdne] {tg.n_vertices} nodes, {tg.n_edges} temporal edges",
          flush=True)

    t0 = time.time()
    o_emb = oracle_ctdne(tg, wt, ws, win, negs, alpha, tw)
    t_oracle = time.time() - t0
    o_auc = community_auc_emb(o_emb, labels_by_vid)

    t0 = time.time()
    m = CTDNE(tg, seed=0, time_window=tw)
    m.init(dim=DIM)
    m.train(walk_times=wt, walk_steps=ws, window_size=win,
            negative_samples=negs, alpha=alpha, verbose=False)
    t_ours = time.time() - t0
    u_auc = community_auc_emb(np.asarray(m.state["vertex"]),
                              labels_by_vid)
    print(f"{'ctdne':14s} ours comm-AUC={u_auc:.4f} ({t_ours:.0f}s) | "
          f"oracle {o_auc:.4f} ({t_oracle:.0f}s)", flush=True)
    return "ctdne", u_auc, o_auc, None, None


def run_mp2v():
    from smore_tpu.graph.hetero import HeteroGraph
    from smore_tpu.models.metapath2vec import Metapath2Vec

    path = make_hetero("/tmp/oracle_hetero.txt")
    hg = HeteroGraph.load_edge_list(path, undirected=True)
    mp = ["author", "paper", "author"]
    # Go metapath cycling (hetero_graph.go:236-248) dead-ends an A-P-A
    # walk at length 3 (the cycled next type after the 2nd author is
    # 'author' again), so each walk yields only ~6 skip-gram pairs --
    # walk_times carries the whole budget.
    wt, ws, win, negs, alpha = 200, 16, 5, 5, 0.025
    # author a{i} topic = i // 80; papers/venues by their own prefix
    labels = np.zeros(hg.n_vertices, dtype=np.int64)
    author_rows = []
    for vid, nm in enumerate(hg.names):
        if nm.startswith("a"):
            labels[vid] = int(nm[1:]) // 80
            author_rows.append(vid)
    author_rows = np.asarray(author_rows)
    print(f"[metapath2vec] {hg.n_vertices} nodes", flush=True)

    t0 = time.time()
    o_emb = oracle_metapath2vec(hg, mp, wt, ws, win, negs, alpha)
    t_oracle = time.time() - t0
    o_auc = community_auc_emb(o_emb[author_rows], labels[author_rows])

    t0 = time.time()
    m = Metapath2Vec(hg, seed=0)
    m.add_meta_path(mp)
    m.init(dim=DIM)
    m.train(walk_times=wt, walk_steps=ws, window_size=win,
            negative_samples=negs, alpha=alpha, verbose=False)
    t_ours = time.time() - t0
    u_auc = community_auc_emb(
        np.asarray(m.state["vertex"])[author_rows], labels[author_rows])
    print(f"{'metapath2vec':14s} ours comm-AUC={u_auc:.4f} "
          f"({t_ours:.0f}s) | oracle {o_auc:.4f} ({t_oracle:.0f}s)",
          flush=True)
    return "metapath2vec", u_auc, o_auc, None, None


def main():
    want = sys.argv[1:] or ["transe", "rotate", "complex", "sne", "ctdne",
                            "metapath2vec"]
    rows = []
    for w in want:
        if w in ("transe", "rotate", "complex"):
            rows.append(run_kg(w))
        elif w == "sne":
            rows.append(run_sne())
        elif w == "ctdne":
            rows.append(run_ctdne())
        elif w == "metapath2vec":
            rows.append(run_mp2v())
    print("\n| model | ours | oracle (Go semantics) | metric |")
    print("|---|---|---|---|")
    for name, u, o, uh, oh in rows:
        metric = "MRR" if uh is not None else "AUC"
        extra = f" (hits@3 {uh:.3f} vs {oh:.3f})" if uh is not None else ""
        print(f"| {name} | {u:.4f} | {o:.4f} | {metric}{extra} |")


if __name__ == "__main__":
    main()
