"""One-command NFCorpus effectiveness-parity check against the reference.

The reference's quickstart publishes (docs/quick.md:24-29, fold s1, BM25 with
b=0.8, k1=0.9, porter stemming, title queries):

    map         = 0.1520
    ndcg_cut_10 = 0.3247

This script runs the identical pipeline end-to-end on the TPU engine and asserts
both metrics within 1% (the BASELINE.json target). It needs the raw NFCorpus
distribution, which this sandbox cannot download (zero egress). Supply it with:

    # from https://www.cl.uni-heidelberg.de/statnlpgroup/nfcorpus/nfcorpus.tar.gz
    tar xzf nfcorpus.tar.gz
    python scripts/parity_nfcorpus.py --corpus /path/to/nfcorpus

Offline evidence of the same pipeline pieces lives in PARITY.md.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PUBLISHED = {"map": 0.1520, "ndcg_cut_10": 0.3247}
TOLERANCE = 0.01  # within 1% relative


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="path to the extracted nfcorpus directory")
    ap.add_argument("--fold", default="s1")
    args = ap.parse_args()

    import capreolus_tpu

    capreolus_tpu.load_all_modules()
    from capreolus_tpu.task import Task

    task = Task.create(
        "rank",
        {
            "benchmark": {"name": "nf", "collection": {"path": args.corpus}},
            "searcher": {
                "name": "BM25", "b": 0.8, "k1": 0.9,
                "index": {"stemmer": "porter"},
            },
        },
    )
    task.search()
    results = task.evaluate()
    # nf has a single fold (s1), so the cross-validated score IS the s1 score
    fold_metrics = results["score"]
    print("measured:", {k: round(fold_metrics.get(k, float("nan")), 4) for k in PUBLISHED})
    print("published:", PUBLISHED)
    ok = True
    for metric, want in PUBLISHED.items():
        got = fold_metrics.get(metric)
        rel = abs(got - want) / want
        status = "OK" if rel <= TOLERANCE else "FAIL"
        ok &= rel <= TOLERANCE
        print(f"  {metric}: got {got:.4f}, published {want:.4f}, rel diff {rel:.2%} -> {status}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
