"""Run EVERY smore subcommand with DEFAULT flags on tiny toy inputs and
assert the saved embeddings are finite.

This is the regression harness for the clamp_batch / collision="mean"
stability guards (found 2026-08-19: default batch 32768 NaN'd the README
toy net; CBOW-family models diverged even at batch=1 when the neighbor
bag exceeds the graph). Fixtures are created in /tmp/clisweep.
Usage: python experiments/cli_default_sweep.py
"""
import sys, os, time, glob
sys.path.insert(0, "/root/repo")
os.makedirs("/tmp/clisweep", exist_ok=True)
os.chdir("/tmp/clisweep")
open("net.txt","w").write("u1 i1 1\nu1 i2 1\nu2 i2 1\nu2 i3 1\nu3 i3 1\n")
open("field.txt","w").write("u1 0\nu2 0\nu3 0\ni1 1\ni2 1\ni3 1\n")
open("field3.txt","w").write("u1 0\nu2 0\nu3 0\ni1 2\ni2 2\ni3 1\n")
open("het.txt","w").write("a1 A b1 B 1\na1 A b2 B 1\na2 A b2 B 1\na2 A b3 B 1\na3 A b3 B 1\n")
open("tmp.txt","w").write("u1 i1 1\nu1 i2 2\nu2 i2 3\nu2 i3 4\nu3 i3 5\nu3 i1 6\n")
open("sgn.txt","w").write("a b +1\nb c +1\nc d -1\nd a -1\na c +1\n")
open("kg.txt","w").write("a r1 b\nb r1 c\nc r2 a\na r2 c\nb r2 a\n")
import numpy as np
import jax; jax.config.update("jax_platforms", "cpu")
from smore_tpu.cli.main import main

C = []
for m in ["line","pe","hpe","mf","bpr","warp","skewopt","eco"]:
    C.append((m, [m,"-train","net.txt","-save",f"{m}.txt","-dimensions","8","-sample_times","0.01"]))
for m in ["deepwalk","walklets","node2vec"]:
    C.append((m, [m,"-train","net.txt","-save",f"{m}.txt","-dimensions","8","-walk_times","2","-walk_steps","5"]))
C.append(("app", ["app","-train","net.txt","-save","app.txt","-dimensions","8","-walk_times","2"]))
C.append(("fastrp", ["fastrp","-train","net.txt","-save","fastrp.txt","-dimensions","8"]))
C.append(("hoprec", ["hoprec","-train","net.txt","-field","field.txt","-save","hoprec.txt","-dimensions","8","-sample_times","0.01"]))
for m in ["nemf","nerank","fine","msfine","gcn"]:
    C.append((m, [m,"-train","net.txt","-field","field.txt","-save",f"{m}.txt","-dimensions","8","-sample_times","0.01"]))
for m in ["textgcn","textgcndev"]:
    C.append((m, [m,"-train","net.txt","-field","field3.txt","-save",f"{m}.txt","-dimensions","8","-sample_times","0.01"]))
for m in ["metapath2vec","han"]:
    C.append((m, [m,"-train","het.txt","-meta_path","A,B,A","-save",f"{m}.txt","-dimensions","8","-walk_times","2","-walk_steps","4"]))
C.append(("ctdne", ["ctdne","-train","tmp.txt","-save","ctdne.txt","-dimensions","8","-walk_times","2","-walk_steps","4"]))
C.append(("sne", ["sne","-train","sgn.txt","-save","sne.txt","-dimensions","8","-epochs","2"]))
for m in ["transe","rotate","complex"]:
    C.append((m, [m,"-train","kg.txt","-save_entity",f"{m}_e.txt","-save_relation",f"{m}_r.txt","-dimensions","8","-epochs","3"]))
C.append(("jodie", ["jodie","-train","tmp.txt","-save_user","jo_u.txt","-save_item","jo_i.txt","-dimensions","8","-epochs","2"]))
for m in ["sasrec","gsasrec","recdenoiser"]:
    C.append((m, [m,"-train","tmp.txt","-save",f"{m}.txt","-dimensions","8","-epochs","1","-max_seq_len","8"]))
C.append(("cpr", ["cpr","-train_target","net.txt","-train_source","net.txt","-save_user","cpr_u.txt","-save_target","cpr_t.txt","-save_source","cpr_s.txt","-dimensions","8","-update_times","0.01"]))
C.append(("tpr", ["tpr","-train_ui","net.txt","-train_iw","net.txt","-save_user","tpr_u.txt","-save_item","tpr_i.txt","-save_word","tpr_w.txt","-dimensions","8","-sample_times","0.01"]))

def has_nan(path):
    bad = 0
    with open(path) as f:
        next(f)
        for line in f:
            v = np.array(line.split()[1:], dtype=float)
            if not np.all(np.isfinite(v)): bad += 1
    return bad

results = {}
for name, argv in C:
    for f in glob.glob("/tmp/clisweep/*.txt"):
        if not os.path.basename(f) in ("net.txt","field.txt","field3.txt","het.txt","tmp.txt","sgn.txt","kg.txt"):
            os.remove(f)
    t0=time.time()
    try:
        rc = main(argv)
        outs = [a for a in argv if a.endswith(".txt") and "save" in argv[argv.index(a)-1].replace("-save","save")]
        outs = [argv[i+1] for i,a in enumerate(argv) if a.startswith("-save")]
        bad = sum(has_nan(o) for o in outs)
        results[name] = f"rc={rc} nan_rows={bad} ({time.time()-t0:.0f}s)"
    except Exception as e:
        results[name] = f"EXC {type(e).__name__}: {e}"
    print(name, "->", results[name], flush=True)

print("\n=== SUMMARY ===")
for k,v in results.items():
    flag = "OK" if ("nan_rows=0" in v and "rc=0" in v) else "FAIL"
    print(f"{flag:4s} {k}: {v}")
