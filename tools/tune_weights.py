#!/usr/bin/env python3
"""Offline weight sweep over the Tune feature dump (dev tooling, not part
of the library). Replicates Scorer.score + Scorer.evaluate EXACTLY
(argmax tie-break by account_id, margin/minScore selection, the FN offset
for gold entities with zero candidate rows) so hundreds of weight configs
evaluate in seconds without a Spark run.

Usage:
  sbt -batch "runMain graft.Tune small"      # writes /tmp/tune_features
  python3 tools/tune_weights.py [n_rounds]
"""
import sys, glob
import numpy as np
import pandas as pd

FEATS = ["name_sim", "text_cos", "desc_overlap", "sg_cos", "log_followers",
         "log_freq", "verified_f", "log_friends", "log_listed",
         "log_statuses", "ff_ratio", "home_match", "home_exists",
         "home_unique"]

# round-3 operating weights (KgConf defaults), new F6 family at 0
W0 = dict(name_sim=11.62, text_cos=0.85, desc_overlap=2.07, sg_cos=0.2,
          log_followers=-0.03, log_freq=0.13, verified_f=0.09,
          log_friends=0.0, log_listed=0.0, log_statuses=0.0, ff_ratio=0.0,
          home_match=0.35, home_exists=-0.61, home_unique=0.13)
B0 = -13.28

df = pd.concat([pd.read_parquet(p) for p in
                glob.glob("/tmp/tune_features/*.parquet")])
gold = pd.concat([pd.read_parquet(p) for p in
                  glob.glob("/tmp/tune_gold/*.parquet")])
gold = gold.rename(columns={"entity": "entity_id", "accountId": "gold_account"})

# gold entities (gold >= 0) with zero candidate rows -> unconditional FN
have_cand = set(df.entity_id.unique())
fn_offset = int(((gold.gold_account >= 0) &
                 ~gold.entity_id.isin(have_cand)).sum())
# picks on entities whose gold row says abstain are FPs; entities absent
# from the dump's gold join can't happen (every entity has a gold row)
X = df[FEATS].to_numpy()
ent = df.entity_id.to_numpy()
acc = df.account_id.to_numpy()
gmap = dict(zip(gold.entity_id, gold.gold_account))
gold_of = np.array([gmap[e] for e in ent])

# stable per-entity grouping: sort once by (entity, account) so argmax
# ties resolve to min account_id like the Window orderBy
order = np.lexsort((acc, ent))
X, ent, acc, gold_of = X[order], ent[order], acc[order], gold_of[order]
bounds = np.flatnonzero(np.r_[True, ent[1:] != ent[:-1]])
ends = np.r_[bounds[1:], len(ent)]

GRID = [(ms * 0.05, mg * 0.1) for ms in range(20) for mg in range(5)]

def evaluate(w, b):
    z = X @ np.array([w[f] for f in FEATS]) + b
    s = 1.0 / (1.0 + np.exp(-z))
    best_i = np.empty(len(bounds), dtype=int)
    second = np.empty(len(bounds))
    for k, (lo, hi) in enumerate(zip(bounds, ends)):
        seg = s[lo:hi]
        i = lo + int(np.argmax(seg))  # first max = min account_id (sorted)
        best_i[k] = i
        if hi - lo > 1:
            seg2 = seg.copy(); seg2[i - lo] = -np.inf
            second[k] = seg2.max()
        else:
            second[k] = 0.0
    bs, ga, pa = s[best_i], gold_of[best_i], acc[best_i]
    out = []
    for ms, mg in GRID:
        # strict > like the Column exprs (no epsilon)
        picked = (bs - second > mg) & (bs > ms)
        tp = int(((ga == pa) & picked).sum())
        fp = int((picked & ((ga < 0) | (pa != ga))).sum())
        fn = int(((ga >= 0) & (~picked | (pa != ga))).sum()) + fn_offset
        p = tp / max(tp + fp, 1); r = tp / max(tp + fn, 1)
        f1 = 2 * p * r / max(p + r, 1e-9)
        out.append((f1, p, r, ms, mg, tp, fp, fn))
    return max(out)

rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 400
rng = np.random.default_rng(42)
best = (evaluate(W0, B0), dict(W0), B0)
print("start:", [round(v, 4) if isinstance(v, float) else v
                 for v in best[0][:5]])
keys = FEATS
for it in range(rounds):
    w = dict(best[1]); b = best[2]
    k = rng.integers(1, 4)
    for f in rng.choice(keys, size=k, replace=False):
        scale = max(abs(w[f]), 0.3)
        w[f] += rng.normal(0, 0.35) * scale
    if rng.random() < 0.3:
        b += rng.normal(0, 0.6)
    r = evaluate(w, b)
    if r[0] > best[0][0]:
        best = (r, w, b)
        print(f"[{it}] F1={r[0]:.4f} P={r[1]:.4f} R={r[2]:.4f} "
              f"ms={r[3]:.2f} mg={r[4]:.1f} tp={r[5]} fp={r[6]} fn={r[7]}")
(f1, p, r_, ms, mg, tp, fp, fn), w, b = best
print("\nbest F1=%.4f P=%.4f R=%.4f at (minScore=%.2f, margin=%.1f)"
      % (f1, p, r_, ms, mg))
print("weights:")
for f in FEATS:
    print(f"  {f} = {w[f]:.4f}")
print(f"  bias = {b:.4f}")
