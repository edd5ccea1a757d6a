#!/usr/bin/env python3
"""Offline weight sweep over the Tune feature dump (dev tooling, not part
of the library). Replicates Scorer.score + Scorer.evaluate EXACTLY
(argmax tie-break by account_id, margin/minScore selection, the FN offset
for gold entities with zero candidate rows) so hundreds of weight configs
evaluate in seconds without a Spark run.

Usage:
  sbt -batch "runMain graft.Tune small"      # writes /tmp/tune_features_small
  sbt -batch "runMain graft.Tune tiny"       # writes /tmp/tune_features_tiny
  python3 tools/tune_weights.py [rounds] [--fit small] [--cv tiny] [--cross]

--fit:   scale suffix of the dump to fit on (default small)
--cv:    scale suffix to cross-validate start vs best on (skipped if absent)
--cross: append all C(n,2) pairwise feature products to the model
         (F20, ISWC17Strategy.java:86-92) — the A/B vs the linear model
"""
import sys, glob, itertools, os
import numpy as np
import pandas as pd

FEATS = ["name_sim", "text_cos", "desc_overlap", "sg_cos", "log_followers",
         "log_freq", "verified_f", "log_friends", "log_listed",
         "log_statuses", "ff_ratio", "home_match", "home_exists",
         "home_unique", "recency_days", "order_f"]

# round-4 operating weights (KgConf defaults), new F9/F11 features at 0
W0 = dict(name_sim=11.62, text_cos=1.1565, desc_overlap=1.5986, sg_cos=0.2,
          log_followers=-0.03, log_freq=0.13, verified_f=0.09,
          log_friends=0.0, log_listed=0.0, log_statuses=0.0193,
          ff_ratio=0.0032, home_match=0.35, home_exists=-0.61,
          home_unique=0.2137, recency_days=0.0, order_f=0.0)
B0 = -12.8576

args = [a for a in sys.argv[1:]]
def opt(name, default):
    if name in args:
        i = args.index(name)
        v = args[i + 1]
        del args[i:i + 2]
        return v
    return default
CROSS = "--cross" in args
if CROSS:
    args.remove("--cross")
FIT = opt("--fit", "small")
CV = opt("--cv", "tiny")
rounds = int(args[0]) if args else 400

GRID = [(ms * 0.05, mg * 0.1) for ms in range(20) for mg in range(5)]

def load(suffix):
    fdir = f"/tmp/tune_features_{suffix}"
    gdir = f"/tmp/tune_gold_{suffix}"
    if not glob.glob(fdir + "/*.parquet"):
        return None
    df = pd.concat([pd.read_parquet(p) for p in glob.glob(fdir + "/*.parquet")])
    gold = pd.concat([pd.read_parquet(p) for p in glob.glob(gdir + "/*.parquet")])
    gold = gold.rename(columns={"entity": "entity_id", "accountId": "gold_account"})
    # gold entities (gold >= 0) with zero candidate rows -> unconditional FN
    have_cand = set(df.entity_id.unique())
    fn_offset = int(((gold.gold_account >= 0) &
                     ~gold.entity_id.isin(have_cand)).sum())
    X = df[FEATS].to_numpy()
    ent = df.entity_id.to_numpy()
    acc = df.account_id.to_numpy()
    gmap = dict(zip(gold.entity_id, gold.gold_account))
    gold_of = np.array([gmap[e] for e in ent])
    # stable per-entity grouping: sort once by (entity, account) so argmax
    # ties resolve to min account_id like the Window orderBy
    order = np.lexsort((acc, ent))
    X, ent, acc, gold_of = X[order], ent[order], acc[order], gold_of[order]
    if CROSS:
        prods = [(X[:, i] * X[:, j])[:, None]
                 for i, j in itertools.combinations(range(len(FEATS)), 2)]
        X = np.hstack([X] + prods)
    bounds = np.flatnonzero(np.r_[True, ent[1:] != ent[:-1]])
    ends = np.r_[bounds[1:], len(ent)]
    return dict(X=X, ent=ent, acc=acc, gold_of=gold_of,
                bounds=bounds, ends=ends, fn_offset=fn_offset)

KEYS = list(FEATS)
if CROSS:
    KEYS += [f"{a}_x_{b}" for a, b in itertools.combinations(FEATS, 2)]

def wvec(w):
    return np.array([w.get(k, 0.0) for k in KEYS])

def evaluate(d, w, b):
    X, acc, gold_of = d["X"], d["acc"], d["gold_of"]
    bounds, ends, fn_offset = d["bounds"], d["ends"], d["fn_offset"]
    z = X @ wvec(w) + b
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

fit = load(FIT)
if fit is None:
    sys.exit(f"no dump at /tmp/tune_features_{FIT} — run graft.Tune {FIT} first")

rng = np.random.default_rng(42)
start = (evaluate(fit, W0, B0), dict(W0), B0)
best = start
print(f"fit={FIT} cross={CROSS} dims={len(KEYS)}")
print("start:", [round(v, 4) if isinstance(v, float) else v
                 for v in best[0][:5]])
for it in range(rounds):
    w = dict(best[1]); b = best[2]
    k = rng.integers(1, 4)
    for f in rng.choice(KEYS, size=k, replace=False):
        cur = w.get(f, 0.0)
        scale = max(abs(cur), 0.3)
        w[f] = cur + rng.normal(0, 0.35) * scale
    if rng.random() < 0.3:
        b += rng.normal(0, 0.6)
    r = evaluate(fit, w, b)
    if r[0] > best[0][0]:
        best = (r, w, b)
        print(f"[{it}] F1={r[0]:.4f} P={r[1]:.4f} R={r[2]:.4f} "
              f"ms={r[3]:.2f} mg={r[4]:.1f} tp={r[5]} fp={r[6]} fn={r[7]}")
(f1, p, r_, ms, mg, tp, fp, fn), w, b = best
print("\nbest F1=%.4f P=%.4f R=%.4f at (minScore=%.2f, margin=%.1f)"
      % (f1, p, r_, ms, mg))
print("weights (nonzero):")
for f in KEYS:
    if w.get(f, 0.0) != 0.0:
        print(f"  {f} = {w[f]:.4f}")
print(f"  bias = {b:.4f}")

cv = load(CV)
if cv is not None:
    s0 = evaluate(cv, start[1], start[2])
    s1 = evaluate(cv, w, b)
    print(f"\ncv={CV}: start F1={s0[0]:.4f} (ms={s0[3]:.2f} mg={s0[4]:.1f})"
          f" -> best F1={s1[0]:.4f} (ms={s1[3]:.2f} mg={s1[4]:.1f})")
