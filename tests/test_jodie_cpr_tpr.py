"""JODIE, CPR, TPR: stores + learning/smoke gates."""

import numpy as np
import pytest

from smore_tpu.graph.bipartite import InteractionGraph
from smore_tpu.models.cpr import CPR, TPR
from smore_tpu.models.jodie import JODIE


@pytest.fixture(scope="module")
def interactions_path(tmp_path_factory):
    """Users repeatedly interact with their own cluster's items over
    time; cluster = parity."""
    rng = np.random.default_rng(6)
    events = []
    t = 0.0
    for _ in range(600):
        u = rng.integers(0, 10)
        own = [i for i in range(12) if i % 2 == u % 2]
        i = rng.choice(own)
        t += rng.random()
        events.append(f"u{u} i{i} {t:.3f}\n")
    p = tmp_path_factory.mktemp("b") / "interactions.txt"
    p.write_text("".join(events))
    return str(p)


def test_interaction_graph_loader(interactions_path):
    ig = InteractionGraph.load_interactions(interactions_path)
    assert ig.n_users == 10 and ig.n_items == 12
    assert ig.n_interactions == 600
    assert np.all(np.diff(ig.timestamps) >= 0)  # time-sorted
    # per-user lists are time-ordered
    for u in range(ig.n_users):
        idx = ig.user_interactions(u)
        assert np.all(np.diff(ig.timestamps[idx]) >= 0)
        assert np.all(ig.user_ids[idx] == u)


def test_jodie_trains_and_predicts(interactions_path, tmp_path):
    ig = InteractionGraph.load_interactions(interactions_path)
    m = JODIE(ig, seed=0)
    m.init(dim=16)
    m.train(epochs=5, learning_rate=0.05, bce_lr=0.2, verbose=False)
    acc = m.evaluate_predictions()
    # pos vs random-neg pairwise accuracy should beat chance
    assert acc > 0.55
    m.save_weights(str(tmp_path / "u.txt"), str(tmp_path / "i.txt"))
    assert (tmp_path / "u.txt").read_text().split("\n")[0] == "10 16"


def test_jodie_projection(interactions_path):
    ig = InteractionGraph.load_interactions(interactions_path)
    m = JODIE(ig, seed=0)
    m.init(dim=8)
    import jax.numpy as jnp

    e = jnp.ones((8,))
    assert np.allclose(np.asarray(m.project(e, 0.0)), 1.0)  # no-op
    proj = np.asarray(m.project(e, 5.0))
    assert proj.shape == (8,) and np.all(np.abs(proj) <= 1.0)


@pytest.fixture(scope="module")
def two_domain_paths(tmp_path_factory):
    rng = np.random.default_rng(8)
    d = tmp_path_factory.mktemp("cpr")
    t_lines, s_lines = [], []
    for u in range(12):
        own = [i for i in range(16) if i % 2 == u % 2]
        for i in rng.choice(own, 5, replace=False):
            t_lines.append(f"u{u} t{i} 1\n")
        for i in rng.choice(own, 5, replace=False):
            s_lines.append(f"u{u} s{i} 1\n")
    (d / "target.txt").write_text("".join(t_lines))
    (d / "source.txt").write_text("".join(s_lines))
    return str(d / "target.txt"), str(d / "source.txt")


def test_cpr_learns(two_domain_paths, tmp_path):
    m = CPR.load_domains(*two_domain_paths, seed=0)
    m.init(dim=16)
    m.train(update_times=0.05, alpha=0.05, batch=64, steps_per_call=8,
            verbose=False)
    g = m.target
    wu = np.asarray(m.state["user"])
    wt = np.asarray(m.state["target"])
    own, other = [], []
    for u in range(12):
        for i in range(16):
            nm = f"t{i}"
            if nm not in g.name2id:
                continue
            s = wu[g.name2id[f"u{u}"]] @ wt[g.name2id[nm]]
            (own if i % 2 == u % 2 else other).append(s)
    assert np.mean(own) > np.mean(other)
    m.save_weights(str(tmp_path / "u.txt"), str(tmp_path / "t.txt"),
                   str(tmp_path / "s.txt"))
    assert (tmp_path / "t.txt").exists()


@pytest.fixture(scope="module")
def tpr_paths(tmp_path_factory):
    rng = np.random.default_rng(13)
    d = tmp_path_factory.mktemp("tpr")
    ui, iw = [], []
    for u in range(12):
        own = [i for i in range(16) if i % 2 == u % 2]
        for i in rng.choice(own, 5, replace=False):
            ui.append(f"u{u} it{i} 1\n")
    for i in range(16):
        for w in range(3):
            iw.append(f"it{i} w{(i % 2) * 3 + w} 1\n")
    (d / "ui.txt").write_text("".join(ui))
    (d / "iw.txt").write_text("".join(iw))
    return str(d / "ui.txt"), str(d / "iw.txt")


def test_tpr_learns(tpr_paths, tmp_path):
    m = TPR.load_graphs(*tpr_paths, seed=0, text_weight=0.3)
    m.init(dim=16)
    m.train(sample_times=0.05, alpha=0.05, batch=64, steps_per_call=8,
            verbose=False)
    g = m.ui
    wu = np.asarray(m.state["user"])
    wi = np.asarray(m.state["item"])
    own, other = [], []
    for u in range(12):
        for i in range(16):
            nm = f"it{i}"
            if nm not in g.name2id:
                continue
            s = wu[g.name2id[f"u{u}"]] @ wi[g.name2id[nm]]
            (own if i % 2 == u % 2 else other).append(s)
    assert np.mean(own) > np.mean(other)
    m.save_weights(str(tmp_path / "u.txt"), str(tmp_path / "i.txt"),
                   str(tmp_path / "w.txt"))
    header = (tmp_path / "w.txt").read_text().split("\n")[0]
    assert header == f"{m.iw.n_vertices} 16"


def test_interactions_before_queries(interactions_path):
    """GetUser/ItemInteractionsBefore + GetLast* parity
    (interaction_graph.go:225-272): strictly-before-t, time-ordered."""
    ig = InteractionGraph.load_interactions(interactions_path)
    tmid = float(np.median(ig.timestamps))
    for uid in range(min(4, ig.n_users)):
        idx = ig.user_interactions_before(uid, tmid)
        allu = ig.user_interactions(uid)
        want = [i for i in allu if ig.timestamps[i] < tmid]
        assert list(idx) == want
        last = ig.last_user_interaction(uid, tmid)
        assert last == (want[-1] if want else -1)
    iid = 0
    idx = ig.item_interactions_before(iid, tmid)
    assert all(ig.timestamps[i] < tmid for i in idx)
    assert (ig.last_item_interaction(iid, 0.0)) == -1
