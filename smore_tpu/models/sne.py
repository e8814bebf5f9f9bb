"""SNE: signed network embedding.

Reference: /root/reference/internal/models/sne/sne.go -- dual source/
target tables; per epoch every positive edge then every negative edge is
processed samples_per_edge times (:107-150):

  positive edge (u, v): sigmoid CE pull (label 1) + K random vertices
    pushed (label 0)                                     (:238-277)
  negative edge (u, v): sigmoid CE push (label 0, weight beta) + K random
    vertices PULLED (label 1, weight beta)               (:280-318)

Random vertices are uniform over all (SampleVertex :248-250).
SaveEmbeddings (:321-360): concatenated [source | target] per vertex.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.graph.signed import SignedNetwork
from smore_tpu.io.embeddings import save_embeddings
from smore_tpu.models.base import clamp_batch, TrainDriver, init_embedding
from smore_tpu.ops.update import sgns_step


class SNE:
    def __init__(self, net: SignedNetwork, seed: int = 0, beta: float = 1.0,
                 negative_samples: int = 5):
        self.net = net
        self.seed = seed
        self.beta = beta
        self.negative_samples = negative_samples
        self.state = {}
        self.dim = 0

    @classmethod
    def load_edge_list(cls, path: str, undirected: bool = True, **kw):
        return cls(SignedNetwork.load_edge_list(path, undirected), **kw)

    def init(self, dim: int) -> None:
        self.dim = dim
        n = self.net.n_vertices
        k1, k2 = jax.random.split(jax.random.PRNGKey(self.seed))
        self.state = {
            "source": init_embedding(k1, n, dim),
            "target": init_embedding(k2, n, dim),
        }

    def _make_step(self, batch, collision):
        net = self.net
        K = self.negative_samples
        beta = self.beta
        n = net.n_vertices
        pos_edges = (jnp.asarray(net.pos_src), jnp.asarray(net.pos_dst))
        neg_edges = (jnp.asarray(net.neg_src), jnp.asarray(net.neg_dst))
        n_pos = len(net.pos_src)
        n_neg = len(net.neg_src)
        if n_pos == 0 and n_neg == 0:
            raise ValueError(
                "signed network has no edges -- accepted sign tokens are "
                "+1/1/pos/positive, -1/neg/negative, or any numeric value "
                "(reference pkg/signed/signed_network.go:86-103)"
            )

        def step(state, _, key, alpha):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            ws, wt = state["source"], state["target"]

            l1 = jnp.float32(0.0)
            if n_pos > 0:
                # positive edges: standard SGNS (uniform negatives)
                i = jax.random.randint(k1, (batch,), 0, n_pos)
                u_p = pos_edges[0].at[i].get(mode="promise_in_bounds")
                v_p = pos_edges[1].at[i].get(mode="promise_in_bounds")
                negs = jax.random.randint(k2, (batch, K), 0, n)
                ws, wt, l1 = sgns_step(
                    ws, wt, u_p, v_p, negs, alpha, collision=collision
                )

            l2 = jnp.float32(0.0)
            if n_neg > 0:
                # negative edges: push endpoints apart (label 0) and pull
                # random vertices (label 1), both scaled by beta
                j = jax.random.randint(k3, (batch,), 0, n_neg)
                u_n = neg_edges[0].at[j].get(mode="promise_in_bounds")
                v_n = neg_edges[1].at[j].get(mode="promise_in_bounds")
                rand_v = jax.random.randint(k4, (batch, K), 0, n)

                su = ws.at[u_n].get(mode="promise_in_bounds")
                tv = wt.at[v_n].get(mode="promise_in_bounds")
                tr = wt.at[rand_v].get(mode="promise_in_bounds")  # (B,K,D)

                g_edge = (0.0 - jax.nn.sigmoid(
                    jnp.einsum("bd,bd->b", su, tv))) * (alpha * beta)
                g_rand = (1.0 - jax.nn.sigmoid(
                    jnp.einsum("bd,bkd->bk", su, tr))) * (alpha * beta)

                d_su = g_edge[:, None] * tv + jnp.einsum(
                    "bk,bkd->bd", g_rand, tr
                )
                d_tv = g_edge[:, None] * su
                d_tr = g_rand[:, :, None] * su[:, None, :]

                from smore_tpu.ops.update import scatter_apply

                B, Kk, D = d_tr.shape
                wt = scatter_apply(
                    wt,
                    [
                        (v_n, d_tv),
                        (rand_v.reshape(-1), d_tr.reshape(B * Kk, D)),
                    ],
                    collision,
                )
                ws = scatter_apply(ws, [(u_n, d_su)], collision)
                l2 = -jnp.mean(jnp.log(1.0 - jax.nn.sigmoid(
                    jnp.einsum("bd,bd->b", su, tv)) + 1e-7))

            return {"source": ws, "target": wt}, l1 + l2

        return step

    def train(
        self,
        epochs: int = 10,
        samples_per_edge: int = 1,
        alpha: float = 0.025,
        batch: int = 4096,
        steps_per_call: int = 32,
        collision: str = "sum",
        verbose: bool = True,
        checkpoint: str = None,
        checkpoint_every: int = 1,
        resume: bool = True,
    ) -> None:
        total = (
            epochs
            * samples_per_edge
            * (len(self.net.pos_src) + len(self.net.neg_src))
        )
        batch = clamp_batch(self.net.n_vertices, batch)
        driver = TrainDriver(
            self._make_step(batch, collision),
            ctx=(),
            samples_per_step=batch * 2,  # one pos + one neg edge per slot
            alpha=alpha,
            total_samples=max(total, 1),
            steps_per_call=steps_per_call,
            checkpoint_path=checkpoint,
            checkpoint_every=checkpoint_every,
            resume=resume,
        )
        self.state = driver.train(
            self.state, jax.random.PRNGKey(self.seed), verbose=verbose
        )

    def save_weights(self, path: str) -> None:
        out = np.concatenate(
            [np.asarray(self.state["source"]), np.asarray(self.state["target"])],
            axis=1,
        )
        save_embeddings(path, self.net.names, out)

    def predict_sign(self, u: int, v: int) -> float:
        """Signed-link score: dot(source[u], target[v]) (reference
        sne.go PredictSign); > 0 predicts a positive edge."""
        s = np.asarray(self.state["source"][u])
        t = np.asarray(self.state["target"][v])
        return float(s @ t)

    def compute_balance_ratio(self) -> float:
        """Fraction of edges whose predicted sign matches the observed
        sign (reference sne.go:361-392)."""
        ws = np.asarray(self.state["source"])
        wt = np.asarray(self.state["target"])
        net = self.net
        correct = total = 0
        if len(net.pos_src):
            s = np.sum(ws[net.pos_src] * wt[net.pos_dst], axis=1)
            correct += int((s > 0).sum())
            total += len(s)
        if len(net.neg_src):
            s = np.sum(ws[net.neg_src] * wt[net.neg_dst], axis=1)
            correct += int((s < 0).sum())
            total += len(s)
        return correct / total if total else 0.0
