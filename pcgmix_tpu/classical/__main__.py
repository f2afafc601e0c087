"""Classical-pipeline CLI: features → prune → aggregate → classifier bench.

Runs the reference's classical.ipynb flow (classical.py:62-113, :115-146,
:165-243, :1391-1617) end-to-end on a packed dataset file:

    python -m pcgmix_tpu.classical --dataset-file zbytes_physionet.dat \
        --out-dir classical_out

Artifacts in --out-dir: features.csv (per-segment), aggregated.csv
(per-recording-window rows) and results.csv (one metrics row per
classifier).  Resume: re-runs skip extraction when features.csv already
exists (delete it to re-extract).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m pcgmix_tpu.classical",
        description="PCG classical-ML pipeline (features + sklearn bench)",
    )
    ap.add_argument("--dataset-file", required=True,
                    help="packed dataset dict (.dat from pcgmix-build)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--band", default="25-400",
                    help="signal band used for feature extraction "
                         "(classical.py:49-55)")
    ap.add_argument("--window", type=int, default=2,
                    help="rolling aggregation window; 0 = single-vector "
                         "per recording")
    ap.add_argument("--no-prune", action="store_true",
                    help="skip the mean-envelope segment outlier removal")
    ap.add_argument("--std-factor", type=float, default=1.4)
    ap.add_argument("--kb-num", type=int, default=40,
                    help="mutual-information top-K feature count")
    ap.add_argument("--seed", type=int, default=4)
    ap.add_argument("--start-counter", type=int, default=0,
                    help="resume feature extraction from this segment "
                         "counter (classical.py:71)")
    ap.add_argument("--skip", type=int, nargs="*", default=(),
                    help="segment counters to skip (classical.py:87)")
    ap.add_argument("--train-wavs", default=None,
                    help="txt of train recordings to keep (an n_fraction "
                         "subset file, classical.py:1424-1428)")
    ap.add_argument("--export-subsets", nargs="*", type=float, default=None,
                    metavar="NFRAC",
                    help="instead of running the bench, write the "
                         "per-(seed_data, n_fraction) train-wav subset "
                         "files for these n_fractions into --out-dir "
                         "(classical.ipynb cell 21) and exit")
    args = ap.parse_args(argv)

    import pandas as pd

    from pcgmix_tpu import utils
    from pcgmix_tpu.classical import (
        aggregate_features_rolling,
        aggregate_features_single,
        extract_features,
        remove_segments_mean_envelope,
        run_experiment,
    )

    if args.export_subsets is not None:
        from pcgmix_tpu.classical.experiment import export_nfrac_wav_subsets

        dataset = utils.file2dict(args.dataset_file)
        paths = export_nfrac_wav_subsets(
            dataset, args.out_dir, args.export_subsets
        )
        print(f"wrote {len(paths)} subset files to {args.out_dir}",
              file=sys.stderr)
        return 0

    os.makedirs(args.out_dir, exist_ok=True)
    feats_path = os.path.join(args.out_dir, "features.csv")
    partial_path = os.path.join(args.out_dir, "features.partial.csv")
    if os.path.exists(feats_path):
        print(f"resume: loading existing {feats_path}", file=sys.stderr)
        feats = pd.read_csv(feats_path)
    else:
        if os.path.exists(partial_path) and not args.start_counter:
            # a crashed extraction left a mid-run checkpoint; make the
            # restart protocol (classical.py:71) explicit instead of
            # silently benchmarking a truncated feature set
            n = sum(1 for _ in open(partial_path)) - 1
            raise SystemExit(
                f"{partial_path} holds a partial extraction ({n} segments). "
                f"Re-run with --start-counter to resume past it, or delete "
                f"it to start over."
            )
        prev = None
        prev_path = os.path.join(args.out_dir, "features.partial.prev.csv")
        if args.start_counter and os.path.exists(partial_path):
            prev = pd.read_csv(partial_path)
            if os.path.exists(prev_path):
                # a third resume: fold the older checkpoint in too
                older = pd.read_csv(prev_path)
                keep = ~older.set_index(["wav", "segment", "split"]).index.isin(
                    prev.set_index(["wav", "segment", "split"]).index
                )
                prev = pd.concat([older[keep], prev], ignore_index=True)
            # preserve the merged history: the re-extraction overwrites
            # features.partial.csv with only the NEW rows, so a second crash
            # must not orphan the earlier checkpointed segments
            prev.to_csv(prev_path, index=False)
        dataset = utils.file2dict(args.dataset_file)
        splits = [s for s in ("train", "test") if s in dataset]
        feats = extract_features(
            dataset, splits=splits, band=args.band,
            start_counter=args.start_counter, skip=args.skip,
            save_path=partial_path,
        )
        if prev is not None:
            done = prev[~prev.set_index(["wav", "segment", "split"]).index.isin(
                feats.set_index(["wav", "segment", "split"]).index
            )]
            feats = pd.concat([done, feats], ignore_index=True)
        feats.to_csv(feats_path, index=False)
        for stale in (partial_path, prev_path):
            if os.path.exists(stale):
                os.remove(stale)
    print(f"{len(feats)} segments x {len(feats.columns)} columns",
          file=sys.stderr)

    if not args.no_prune:
        feats = remove_segments_mean_envelope(feats, std_factor=args.std_factor)
        print(f"after envelope pruning: {len(feats)} segments", file=sys.stderr)

    if args.window > 0:
        agg = aggregate_features_rolling(feats, window=args.window)
    else:
        agg = aggregate_features_single(feats)
    agg.to_csv(os.path.join(args.out_dir, "aggregated.csv"), index=False)

    train_wavs = None
    if args.train_wavs:
        train_wavs = [
            ln.strip() for ln in open(args.train_wavs) if ln.strip()
        ]
        print(f"n_fraction subset: {len(train_wavs)} train recordings",
              file=sys.stderr)
    results = run_experiment(
        agg, kb_num=args.kb_num, seed=args.seed, train_wavs=train_wavs
    )
    results.to_csv(os.path.join(args.out_dir, "results.csv"), index=False)
    print(results.to_string(index=False))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
