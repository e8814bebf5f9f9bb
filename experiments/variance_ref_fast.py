"""Fast reference arms for variance_bars (same probes, fast parse).

variance_bars.py's pure-Python load_embeddings needs ~8 min per 650MB
reference dump; at 2 dumps x 3 seeds that pushes the ref arms past an
hour. This runner produces the IDENTICAL statistics (same
yt_scale_bench.community_auc gate, same microf1_scale.softmax_probe at
iters=150 on the same rng(123) 200k subsample) but parses the dumps
with numpy (~40s) and can score seed 0 from dumps already on disk.

Usage: python experiments/variance_ref_fast.py [n_seeds] [--reuse-first]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")  # probes are host-side

from bench import make_youtube_graph  # noqa: E402
from longtail_parity import REF_DIR, ensure_build_tree  # noqa: E402
from microf1_scale import softmax_probe  # noqa: E402
from yt_scale_bench import YT, community_auc, labels  # noqa: E402

BUDGET = 40
N_FULL = 1_100_000


def fast_load_raw(path):
    """Parse a reference embedding dump -> (vids, (n, dim) rows);
    ~10x the pure-Python loader. Only vertices the reference SAW are in
    the dump (~922k of the 1.1M names at YT scale)."""
    with open(path) as f:
        header = f.readline().split()
        dim = int(header[1])
        names = []
        chunks = []
        rows = []
        for line in f:
            sp = line.index(" ")
            names.append(int(line[1:sp]))
            vals = line[sp + 1:].split()
            rows.append(np.fromiter(vals, dtype=np.float32,
                                    count=len(vals)))
            if len(rows) >= 100_000:
                chunks.append(np.stack(rows))
                rows = []
        if rows:
            chunks.append(np.stack(rows))
    emb = np.concatenate(chunks) if chunks else np.zeros((0, dim))
    return np.asarray(names), emb


def fast_load(path):
    """(N_FULL, dim) array indexed BY NAME. Rows for names absent from
    the dump are ZERO -- fine for the f1 probes (variance_bars pads the
    ours arms identically via by_name), WRONG for the AUC gate (the
    ours gate is scored on present rows only): use fast_load_raw +
    community_auc there."""
    vids, emb = fast_load_raw(path)
    out = np.zeros((N_FULL, emb.shape[1]), dtype=np.float32)
    out[vids] = emb
    return out


def run_ref(order, out):
    ensure_build_tree()
    subprocess.run(
        [os.path.join(REF_DIR, "cli", "line"), "-train", YT, "-save",
         out, "-order", str(order), "-dimensions", "64",
         "-sample_times", str(BUDGET), "-negative_samples", "5",
         "-threads", str(os.cpu_count() or 1)],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def auc_present(vids, rows):
    """Gate-AUC over the rows the reference actually trained --
    matches how the ours arms are scored (community_auc on the model's
    own (rows, names), no zero padding)."""
    return community_auc(rows, [f"v{int(v)}" for v in vids])


def stats(tag, vals):
    a = np.asarray(vals)
    sd = a.std(ddof=1) if len(a) > 1 else 0.0
    print(f"{tag}: {' '.join(f'{v:.4f}' for v in a)}  -> "
          f"{a.mean():.4f} +- {sd:.4f} (sample sd, ddof=1)", flush=True)


def main():
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    reuse = "--reuse-first" in sys.argv
    make_youtube_graph(YT)
    lab = labels()
    sub = np.random.default_rng(123).choice(N_FULL, 200_000,
                                            replace=False)
    ref_auc, ref_f1c, ref_f1o2 = [], [], []
    for s in range(n_seeds):
        o2p, o1p = "/tmp/var_ref_o2.txt", "/tmp/var_ref_o1.txt"
        if not (reuse and s == 0 and os.path.exists(o2p)
                and os.path.exists(o1p)):
            t0 = time.time()
            run_ref(2, o2p)
            run_ref(1, o1p)
            print(f"  ref seed {s}: trained in {time.time()-t0:.0f}s",
                  flush=True)
        t0 = time.time()
        v2, r2 = fast_load_raw(o2p)
        m2 = np.zeros((N_FULL, r2.shape[1]), dtype=np.float32)
        m2[v2] = r2
        m1 = fast_load(o1p)
        print(f"  ref seed {s}: parsed in {time.time()-t0:.0f}s",
              flush=True)
        ref_auc.append(auc_present(v2, r2))
        ref_f1o2.append(softmax_probe(m2[sub], lab[sub], iters=150))
        ref_f1c.append(softmax_probe(
            np.concatenate([m1, m2], 1)[sub], lab[sub], iters=150))
        print(f"ref seed {s}: gate-AUC {ref_auc[-1]:.4f} "
              f"f1(o1+o2) {ref_f1c[-1]:.4f} f1(o2) {ref_f1o2[-1]:.4f}",
              flush=True)
    print("\n=== ref mean +- sd over seeds ===")
    stats("ref gate-AUC ", ref_auc)
    stats("ref f1 o1+o2 ", ref_f1c)
    stats("ref f1 o2    ", ref_f1o2)


if __name__ == "__main__":
    main()
