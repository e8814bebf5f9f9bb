"""Sequential-model ranking eval: full-autodiff transformer vs the
reference's forward-only training, head-to-head on seeded data.

The reference (sasrec.go:553-593) initializes the transformer but only
ever trains the item embedding table -- attention/FFN/LN receive no
gradients. The Go toolchain is not in this image, so the reference arm
is reproduced EXACTLY inside our harness via train(forward_only=True):
same sequences, same loss, same init, same optimizer schedule -- the
ONLY difference is which parameters receive gradients. The claim judged
here (VERDICT #7): full autodiff >= forward-only on held-out next-item
prediction (recall@10 / NDCG@10, leave-one-out, full ranking).

Data: seeded Markov sequences -- each item has ~5 likely successors, so
next-item structure is learnable (random recall@10 = 10/n_items).

Run: python experiments/sasrec_eval.py [sasrec gsasrec recdenoiser]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

DATA = "/tmp/sasrec_eval_edges.txt"
N_ITEMS = 2000
N_USERS = 4000
SEQ_LEN = 30
# 100 epochs @ lr 3e-3 with 5 summed negatives: enough budget for the
# full-autodiff arm to actually learn the Markov successor structure
# (recall@10 0.53 vs 0.009 at 30 epochs / 1e-3 / 1 neg, where BOTH arms
# plateau on the "items vs user-vertices" shortcut and rank items at
# chance). Both arms get the IDENTICAL budget/hyperparameters.
EPOCHS = 100
ALPHA = 0.003
NEG_K = 5


def make_data(path: str, seed: int = 0) -> None:
    """Markov-chain interaction sequences as a user->item edge list (the
    file order defines each user's sequence, sasrec.go:82-93)."""
    if os.path.exists(path):
        return
    rng = np.random.default_rng(seed)
    succ = rng.integers(0, N_ITEMS, (N_ITEMS, 5))  # 5 successors per item
    with open(path, "w") as f:
        for u in range(N_USERS):
            it = int(rng.integers(0, N_ITEMS))
            for _ in range(SEQ_LEN):
                f.write(f"u{u} i{it} 1\n")
                if rng.random() < 0.85:  # follow the chain
                    it = int(succ[it, rng.integers(0, 5)])
                else:  # exploration noise
                    it = int(rng.integers(0, N_ITEMS))


def run_arm(cls_name: str, forward_only: bool) -> dict:
    import smore_tpu.models as M

    cls = getattr(M, cls_name)
    m = cls.load_edge_list(DATA, negative_samples=NEG_K)
    m.init(dim=64, max_seq_len=SEQ_LEN, num_blocks=2, num_heads=1,
           dropout=0.2)
    m.train(epochs=EPOCHS, batch_size=128, alpha=ALPHA, verbose=False,
            holdout=True, forward_only=forward_only)
    return m.evaluate_ranking(ks=(10,))


def main() -> None:
    make_data(DATA)
    names = {"sasrec": "SASRec", "gsasrec": "GSASRec",
             "recdenoiser": "RecDenoiser"}
    want = sys.argv[1:] or list(names)
    results = {}
    for key in want:
        cls_name = names[key]
        full = run_arm(cls_name, forward_only=False)
        fwd = run_arm(cls_name, forward_only=True)
        results[key] = (full, fwd)
        print(f"{key:12s}  full-autodiff  recall@10={full['recall@10']:.4f}"
              f"  ndcg@10={full['ndcg@10']:.4f}", flush=True)
        print(f"{key:12s}  forward-only   recall@10={fwd['recall@10']:.4f}"
              f"  ndcg@10={fwd['ndcg@10']:.4f}", flush=True)

    if "sasrec" in results:
        full, fwd = results["sasrec"]
        assert full["ndcg@10"] >= fwd["ndcg@10"], (
            "full-autodiff SASRec must match or beat the reference's "
            f"forward-only training: {full['ndcg@10']:.4f} vs "
            f"{fwd['ndcg@10']:.4f}"
        )
        print("PASS: full-autodiff >= forward-only (reference semantics)")


if __name__ == "__main__":
    main()
