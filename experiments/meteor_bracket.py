"""Measure the METEOR jar-offset bracket on real prediction files.

VERDICT r4 next-2: the Java METEOR 1.5 jar's synonym/paraphrase data
assets (reference: external_tool/densevid_eval/evaluate.py:16,61) are
absent here, so the absolute jar score is unmeasurable — but a bracket is
computable without assets: lo = exact+stem-only METEOR (the production
scorer), hi = METEOR with matchers.PromiscuousSynonymTable (every
non-exact/stem pair admitted at the jar's 0.8 synonym weight, a superset
of any WordNet table).  This tool runs BOTH through the full ANETcaptions
protocol on each given system's predictions and reports [lo, hi] per
system plus whether system RANKING is invariant across the bracket
(non-overlapping intervals).

Usage:
    python experiments/meteor_bracket.py save/SOAK_EC save/SOAK_JT ...
        [--pred latest|best|<file.json>] [--topN 100]

Each argument is a train-run save folder (containing config.json +
pred_sent/pred_iter*.json) or a direct predictions JSON (then --config
must point at a config.json for the dataset/loader).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# host-only work (loader + scorers) — don't attach the TPU relay (the
# container sitecustomize registers the axon plugin at interpreter start;
# set BOTH env and config, like tests/conftest.py)
os.environ["JAX_PLATFORMS"] = "cpu"
try:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
except Exception:
    pass


def _loader_for(cfg_path: str):
    from echr_tpu.config import Config
    from echr_tpu.data.dataset import build_dataset
    from echr_tpu.data.loader import Loader

    cfg = Config.from_json(open(cfg_path).read())
    dataset = build_dataset(cfg)
    return Loader(dataset, cfg, seed=0), cfg


def _pick_pred(folder: str, which: str) -> str:
    preds = sorted(
        glob.glob(os.path.join(folder, "pred_sent", "pred_iter*.json")),
        key=lambda p: int("".join(c for c in os.path.basename(p)
                                  if c.isdigit()) or 0),
    )
    # the soak gate's METEOR comes from the cg-on-GT-proposals eval, whose
    # predictions land in pred_iterN_gt.json (engine/train._run_eval with
    # fast_eval_cg) — prefer those so brackets are soak-band-comparable
    gt = [p for p in preds if p.endswith("_gt.json")]
    preds = gt or preds
    if which != "latest":  # explicit file name under pred_sent/
        return os.path.join(folder, "pred_sent", which)
    if not preds:
        raise FileNotFoundError(f"no pred_sent/pred_iter*.json under {folder}")
    return preds[-1]


def bracket_for(json_path: str, loader, topN: int):
    from echr_tpu.metrics.eval_score import eval_score
    from echr_tpu.metrics.matchers import PromiscuousSynonymTable

    lo = eval_score(json_path, topN=topN, gt_from_loader=loader)
    hi = eval_score(json_path, topN=topN, gt_from_loader=loader,
                    meteor_synonyms=PromiscuousSynonymTable())
    return (100 * float(np.mean(lo["METEOR"])),
            100 * float(np.mean(hi["METEOR"])))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("systems", nargs="+",
                    help="save folders (config.json + pred_sent/) or "
                         "prediction JSONs (with --config)")
    ap.add_argument("--config", default=None,
                    help="config.json when systems are raw prediction JSONs")
    ap.add_argument("--pred", default="latest")
    ap.add_argument("--topN", type=int, default=100,
                    help="the gating eval's cap (engine/train._run_eval)")
    args = ap.parse_args()

    rows = []
    shared = _loader_for(args.config) if args.config else None
    for sysarg in args.systems:
        if os.path.isdir(sysarg):
            loader, _ = _loader_for(os.path.join(sysarg, "config.json"))
            jp = _pick_pred(sysarg, args.pred)
        else:
            if shared is None:
                raise SystemExit("--config required for raw prediction JSONs")
            loader, jp = shared[0], sysarg
        lo, hi = bracket_for(jp, loader, args.topN)
        rows.append((os.path.basename(sysarg.rstrip("/")), lo, hi, jp))
        print(f"{rows[-1][0]:24s}  METEOR in [{lo:6.2f}, {hi:6.2f}]  "
              f"(width {hi-lo:5.2f})  {os.path.basename(jp)}", flush=True)

    by_lo = sorted(rows, key=lambda r: r[1], reverse=True)
    by_hi = sorted(rows, key=lambda r: r[2], reverse=True)
    # strict: pairwise non-overlapping intervals — the jar provably ranks
    # these systems the same way wherever it lands in each bracket.
    # endpoint-consistent: ordering by lo == ordering by hi — the ranking
    # is stable at both bracket ends (the checkable proxy when close
    # systems' intervals overlap; the jar's matcher stages shift systems
    # trained on the same data distribution in the same direction).
    strict = all(a[1] > b[2] for a, b in zip(by_lo, by_lo[1:]))
    print(json.dumps({
        "systems": [{"name": n, "lo": round(lo, 3), "hi": round(hi, 3)}
                    for n, lo, hi, _ in rows],
        "ranking_by_lo": [n for n, *_ in by_lo],
        "ranking_by_hi": [n for n, *_ in by_hi],
        "strict_separation": strict,
        "endpoint_order_consistent":
            [n for n, *_ in by_lo] == [n for n, *_ in by_hi],
    }))


if __name__ == "__main__":
    main()
