"""Experiment grid runner + CLI.

The reference drives experiments from notebook cells that loop
``train_model`` over method × n_fraction × seed_data × seed grids with
``hyperparameters_robust`` rewriting and ``experiment_already_done``
resume-skipping (experiments_timeseries.ipynb cells 4/9).  This module is
the CLI equivalent:

  python -m pcgmix_tpu.exp.runner --dataset-file physionet.dat \
      --methods base durratiomixup "durmixmagwarp(0.2,4)" \
      --n-fractions 0.1 1.0 --seeds 1 2 3 --robust
"""

from __future__ import annotations

import argparse
import copy

from pcgmix_tpu import utils
from pcgmix_tpu.exp.dirs import experiment_already_done, experiment_dir
from pcgmix_tpu.exp.robust import SEED_DATA_GRIDS, hyperparameters_robust
from pcgmix_tpu.train.loop import TrainConfig, train_model


def _salopt_dependency(cfg: TrainConfig, robust: bool) -> TrainConfig | None:
    """The pretrained run a (salopt…) method depends on: same config with
    method 'base' (salopt_model 0) or the robust-rewritten 'durratiomixup' /
    'durmixmagwarp(0.2,4)' (-1/-2 variants) — reference saliency.py:26-37.
    Returns None when the method carries no salopt dependency."""
    from pcgmix_tpu.augment.methods import parse_method
    from pcgmix_tpu.saliency import SALOPT_PRETRAIN_METHODS

    spec = parse_method(cfg.method, spectrogram=cfg.spectrogram)
    if spec.salopt is None:
        return None
    dep = copy.deepcopy(cfg)
    dep.method = SALOPT_PRETRAIN_METHODS[spec.salopt_model]
    if robust and spec.salopt_model:
        dep = hyperparameters_robust(dep)
    dep.save_artifacts = True  # the dependency's checkpoint IS the artifact
    return dep


def _latent_dependency(cfg: TrainConfig) -> TrainConfig | None:
    """The frozen-embedding run a (closestknn/closestbins) method depends on:
    the reference's canonical ResCNN base run (latent_space.py:27-29; trained
    first by the out-of-manifold-intrusion study, experiments_timeseries
    .ipynb cell 13).  Returns None when the method has no latent pairing."""
    from pcgmix_tpu.augment.methods import parse_method
    from pcgmix_tpu.latent import latent_pretrain_config

    spec = parse_method(cfg.method, spectrogram=cfg.spectrogram)
    if spec.pairing not in ("closestknn", "closestbins"):
        return None
    return latent_pretrain_config(cfg)


def run_grid(
    base_cfg: TrainConfig,
    dataset: dict,
    methods,
    n_fractions,
    seeds,
    seed_datas=None,
    robust: bool = True,
    skip_done: bool = True,
    progress: bool = True,
    gang: bool = False,
    gang_devices=None,
    gang_max_size=None,
    gang_fallback: bool = True,
) -> list[TrainConfig]:
    """Run every grid point, skipping finished runs.  Returns the configs
    that were executed.

    (salopt…) methods carry a DAG edge (SURVEY.md §7 hard parts): they need
    a previously trained checkpoint of the same configuration with the
    method swapped.  The runner trains that dependency first if its run
    directory is missing, then wires the saliency provider automatically.
    (closestknn/closestbins) methods likewise depend on the canonical
    frozen ResCNN latent-space run (latent_space.py:27-29), trained here
    first when absent; train_model then auto-loads it.

    gang=True trains grid points that differ only in seed_data/seed
    TOGETHER in one vmapped program (pcgmix_tpu.train.gang) — the
    reference runs its ~10-member seed grids strictly sequentially
    (experiments_timeseries.ipynb cell 13).  Points a gang can't take
    (host-analysis dumps, singleton groups, ragged live-model groups —
    lc-nointrusion/saliency-cutmix gang equal-size members via the
    live-model mode, train/gang.py) fall back to the sequential path.  Run dirs follow the same naming/artifact contract
    either way; trained weights match up to vmap float reassociation (a
    gang-trained salopt DEPENDENCY checkpoint therefore differs from a
    sequentially trained one at that level, and the displacement search's
    argmax may discretize those low-order differences — the reference's
    own CUDA reruns are nondeterministic at the same level).
    gang_devices shards the member axis over a device mesh (dependency
    gangs shard too).  gang_max_size chunks larger groups into sub-gangs
    of at most that many members (bounds the stacked state's HBM: S copies
    of params/opt-state plus S× step activations); None (default) derives
    the cap from device memory via train.gang.estimate_gang_max_size, 0
    disables chunking entirely, any other value is the manual override.  gang_fallback (default
    True) re-runs a gang's members sequentially when the gang program
    fails at runtime (e.g. out of device memory at an ambitious S) instead
    of aborting the grid — resume-skip keeps the fallback from redoing
    finished work; pass False to surface the failure (debugging).
    """
    executed = []

    def salopt_provider_for(cfg):
        """The saliency provider for one (salopt…) config, resolving each
        pretrained checkpoint dir through _salopt_dependency so the gang
        and sequential paths cannot desynchronize."""
        from pcgmix_tpu.saliency import make_pretrained_saliency_fn

        def ckpt_dir_for(method, _cfg=cfg):
            return experiment_dir(_salopt_dependency(_cfg, robust))

        return make_pretrained_saliency_fn(cfg, ckpt_dir_for)

    def already_done(cfg):
        """Execution-time re-check: a dependency trained earlier in THIS
        grid pass (e.g. a salopt method listed before 'base') may have
        completed a pending config after the build-time filter ran."""
        if skip_done and experiment_already_done(cfg):
            if progress:
                print(f"skip (done): {experiment_dir(cfg)}")
            return True
        return False

    def run_one(cfg):
        if already_done(cfg):
            return
        kwargs = {}
        lat_dep = _latent_dependency(cfg)
        if lat_dep is not None and not experiment_already_done(lat_dep):
            if progress:
                print(f"run (latent dependency): {experiment_dir(lat_dep)}")
            train_model(lat_dep, dataset, progress=progress)
            executed.append(lat_dep)
            # train_model auto-loads the frozen model from this run dir
            # (latent.latent_space_for) — no kwargs needed
        dep = _salopt_dependency(cfg, robust)
        if dep is not None:
            if not experiment_already_done(dep):
                if progress:
                    print(f"run (salopt dependency): {experiment_dir(dep)}")
                train_model(dep, dataset, progress=progress)
                executed.append(dep)
            kwargs["saliency_model_provider"] = salopt_provider_for(cfg)
        if progress:
            print(f"run: {experiment_dir(cfg)}")
        train_model(cfg, dataset, progress=progress, **kwargs)
        executed.append(cfg)

    pending = []
    for method in methods:
        for n_frac in n_fractions:
            if seed_datas is not None:
                sds = seed_datas
            elif n_frac in SEED_DATA_GRIDS:
                grid_1d, grid_2d = SEED_DATA_GRIDS[n_frac]
                sds = list(grid_2d if base_cfg.spectrogram else grid_1d)
            else:
                sds = [base_cfg.seed_data]
            for seed_data in sds:
                for seed in seeds:
                    cfg = copy.deepcopy(base_cfg)
                    cfg.method = method
                    cfg.n_fraction = n_frac
                    cfg.seed_data = seed_data
                    cfg.seed = seed
                    if robust:
                        cfg = hyperparameters_robust(cfg)
                    if skip_done and experiment_already_done(cfg):
                        if progress:
                            print(f"skip (done): {experiment_dir(cfg)}")
                        continue
                    pending.append(cfg)

    if not gang:
        for cfg in pending:
            run_one(cfg)
        return executed

    from pcgmix_tpu.train.gang import (
        estimate_gang_max_size, gang_profitable, group_gangable, train_gang,
    )

    profit_cache: dict = {}

    def advise_profitability(cfg):
        """One-time per-model advisory (chip-measured, BENCH.md): ganging
        MXU-saturating models trades ~10-20% steady-state throughput for
        compile amortization; small models gang at 2-3.4×."""
        if cfg.model in profit_cache:
            return
        try:
            profit_cache[cfg.model] = gang_profitable(cfg)
        except Exception:  # noqa: BLE001 - advisory must never block the grid
            profit_cache[cfg.model] = True
        if not profit_cache[cfg.model] and progress:
            print(
                f"gang advisory: {cfg.model} saturates the chip alone "
                f"(≥1M params) — gangs measured 0.87-0.90× sequential "
                f"STEP throughput on TPU v5e (BENCH.md; conv_impl='matmul' "
                f"measured WORSE, 0.51-0.67× — r5 conv sweep), but CAMPAIGN "
                f"wall-clock still favors the gang below ~174 epochs/member "
                f"(2.6× at 8, 1.63× at 24 — r5 campaign A/B); keeping the "
                f"gang. Drop --gang only for peak per-run step throughput."
            )

    def _train_rows():
        d = (
            dataset["train"]
            if "train" in dataset and "test" in dataset else dataset
        )
        return len(d["label"])

    auto_cache: dict = {}

    def auto_max_size(cfg):
        """Memory-derived default gang cap (estimate_gang_max_size):
        gang_max_size=None asks for it; an explicit 0 means unlimited and
        any other value is the manual override."""
        key = (cfg.model, cfg.dataset, cfg.batch_size, cfg.sig_len,
               cfg.op, cfg.compute_dtype, cfg.num_channels)
        if key not in auto_cache:
            rows = _train_rows()
            d = (
                dataset["train"]
                if "train" in dataset and "test" in dataset else dataset
            )
            if cfg.spectrogram:
                # real row shape from the data: spec configs keep sig_len at
                # its 1-D meaning, so deriving the image from cfg is wrong
                row_shape = tuple(d["data"].shape[1:])
                sample_shape = (1, *row_shape)
                corpus_bytes = rows * 4
                for dim in row_shape:
                    corpus_bytes *= dim
            else:
                sample_shape = None
                corpus_bytes = rows * cfg.num_channels * cfg.sig_len * 4
            try:
                auto_cache[key] = estimate_gang_max_size(
                    cfg, train_size=rows, corpus_bytes=corpus_bytes,
                    sample_shape=sample_shape,
                )
            except Exception as e:  # noqa: BLE001 - sizing must not kill grids
                print(
                    f"gang auto-size failed ({type(e).__name__}: {e}) — "
                    f"ganging unchunked; set --gang-max-size explicitly"
                )
                auto_cache[key] = 0
            if progress:
                print(
                    f"gang auto-size: S_max={auto_cache[key]} "
                    f"({cfg.model}, batch {cfg.batch_size}, {cfg.op}, "
                    f"{cfg.compute_dtype}) — override with --gang-max-size"
                )
        return auto_cache[key]

    def chunks(group):
        k = gang_max_size
        if k is None:
            k = auto_max_size(group[0])
        if not k or len(group) <= k:
            return [group]
        return [group[i:i + k] for i in range(0, len(group), k)]

    def gang_or_fallback(members, n_dev, label, **kwargs):
        """Run one gang; on runtime failure (fallback enabled) train the
        members sequentially instead of aborting the grid."""
        try:
            train_gang(
                members, dataset, n_devices=n_dev, progress=progress,
                **kwargs,
            )
            executed.extend(members)
        except Exception as e:  # noqa: BLE001 - deliberate grid resilience
            if not gang_fallback:
                raise
            print(
                f"gang of {len(members)} ({label}) FAILED "
                f"({type(e).__name__}: {e}) — falling back to sequential "
                f"runs (pass gang_fallback=False / --no-gang-fallback to "
                f"surface gang failures instead)"
            )
            for cfg in members:
                run_one(cfg)

    def train_deps(deps):
        """Train missing dependency runs — themselves gangable (they differ
        only in seed_data/seed: e.g. a salopt grid's per-member 'base'
        pretrains form their own gang, sharded like the main one)."""
        missing = [d for d in deps if not experiment_already_done(d)]
        for full_dep_group in group_gangable(missing, dataset):
          for dep_group in chunks(full_dep_group):
            if len(dep_group) >= 2:
                n_dev = (
                    gang_devices
                    if gang_devices and len(dep_group) % gang_devices == 0
                    else None
                )
                if progress:
                    print(
                        f"gang of {len(dep_group)} (dependency): "
                        f"{dep_group[0].method} "
                        f"seed_datas={[c.seed_data for c in dep_group]}"
                    )
                gang_or_fallback(dep_group, n_dev, "dependency")
            else:
                if progress:
                    print(f"run (dependency): {experiment_dir(dep_group[0])}")
                train_model(dep_group[0], dataset, progress=progress)
                executed.append(dep_group[0])

    # model_hooks=True: the (salopt…)/(closest…) methods gang too — their
    # frozen-model planning hooks are wired below after the dependency runs
    for full_group in group_gangable(pending, dataset, model_hooks=True):
      for group in chunks(full_group):
        # a dependency pass earlier in THIS loop may have finished some
        # pending configs (a salopt method listed before its own 'base')
        group = [c for c in group if not already_done(c)]
        if not group:
            continue
        if len(group) >= 2:
            advise_profitability(group[0])
            gang_kwargs = {}
            lat_dep = _latent_dependency(group[0])
            if lat_dep is not None and not experiment_already_done(lat_dep):
                if progress:
                    print(f"run (latent dependency): {experiment_dir(lat_dep)}")
                train_model(lat_dep, dataset, progress=progress)
                executed.append(lat_dep)
                # train_gang auto-loads the frozen model from this run dir
            sal_deps = [_salopt_dependency(cfg, robust) for cfg in group]
            if sal_deps[0] is not None:
                train_deps(sal_deps)
                gang_kwargs["saliency_model_providers"] = [
                    salopt_provider_for(cfg) for cfg in group
                ]
            # the member axis only shards when the gang divides evenly;
            # otherwise run the gang unsharded rather than abort the grid
            n_dev = (
                gang_devices
                if gang_devices and len(group) % gang_devices == 0
                else None
            )
            if progress:
                note = (
                    "" if n_dev == gang_devices or not gang_devices
                    else f" (size {len(group)} not divisible by "
                         f"{gang_devices} devices — running unsharded)"
                )
                print(
                    f"gang of {len(group)}: {group[0].method} "
                    f"nfrac={group[0].n_fraction} "
                    f"seed_datas={[c.seed_data for c in group]}{note}"
                )
            gang_or_fallback(group, n_dev, group[0].method, **gang_kwargs)
        else:
            run_one(group[0])
    return executed


def main(argv=None):
    p = argparse.ArgumentParser(description="PCGmix-TPU experiment grid runner")
    p.add_argument("--dataset-file", required=True, help=".dat dataset dict")
    p.add_argument("--dataset", default="PhysioNet")
    p.add_argument("--model", default="resnet9")
    p.add_argument("--methods", nargs="+", default=["base"])
    p.add_argument("--n-fractions", nargs="+", type=float, default=[1.0])
    p.add_argument("--seeds", nargs="+", type=int, default=[1])
    p.add_argument("--seed-datas", nargs="+", type=int, default=None)
    p.add_argument("--num-epochs", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr-max", type=float, default=0.01)
    p.add_argument("--op", default="adam")
    p.add_argument("--num-channels", type=int, default=4)
    p.add_argument("--valid", action="store_true")
    p.add_argument("--no-robust", action="store_true")
    p.add_argument("--experiments-root", default="experiments")
    p.add_argument(
        "--cvd-map-csv", default=None,
        help="cvds_map.csv (columns wav,diagnosis) for (sameCVD) methods",
    )
    p.add_argument(
        "--compute-dtype", default="float32",
        choices=["float32", "bfloat16"],
        help="bfloat16 = full-rate MXU throughput mode; float32 keeps "
             "reference numerical parity",
    )
    p.add_argument(
        "--steps-per-dispatch", type=int, default=1,
        help=">1 fuses K train steps per dispatch via lax.scan "
             "(~2x wall on a tunneled chip at K=8, see BENCH.md)",
    )
    p.add_argument(
        "--n-devices", type=int, default=None,
        help="data-parallel device count (default: all visible; 1 = no mesh)",
    )
    p.add_argument(
        "--checkpoint-every", type=int, default=0,
        help="epochs between orbax full-state checkpoints (0 = final only)",
    )
    p.add_argument("--eval-batch-size", type=int, default=1000)
    p.add_argument(
        "--sig-len", type=int, default=2500,
        help="cycle length in samples (2500 PhysioNet / 2000 UMC, "
             "experiments_timeseries.ipynb cells 7/22)",
    )
    p.add_argument(
        "--classical-space", action="store_true",
        help="dump per-epoch classical feature CSVs and add the wide band "
             "as a 5th channel (experiments_timeseries.ipynb cell 26)",
    )
    p.add_argument(
        "--latent-space", action="store_true",
        help="dump latent-space pkls during training "
             "(train_model.py:508-518)",
    )
    p.add_argument(
        "--true-seed", type=int, default=None,
        help="override the hardcoded train-balance sampling seed 18 "
             "(dataloader_physionet.py:81-84); 'base-trueseed=N' method "
             "labels also derive it",
    )
    p.add_argument(
        "--gang", action="store_true",
        help="train grid points differing only in seed_data/seed together "
             "in one vmapped program (pcgmix_tpu.train.gang); ineligible "
             "points fall back to sequential runs",
    )
    p.add_argument(
        "--gang-devices", type=int, default=None,
        help="shard the gang's member axis over this many devices "
             "(zero-collective seed parallelism; gang size must divide)",
    )
    p.add_argument(
        "--gang-max-size", type=int, default=None,
        help="chunk larger gangs into sub-gangs of at most this many "
             "members (bounds the stacked state's HBM footprint).  Default "
             "(unset): derived from device memory — params + opt state + "
             "S× step activations vs the backend's reported HBM "
             "(train.gang.estimate_gang_max_size); 0 = unlimited",
    )
    p.add_argument(
        "--no-gang-fallback", action="store_true",
        help="abort the grid when a gang program fails at runtime instead "
             "of re-running its members sequentially",
    )
    p.add_argument(
        "--conv-impl", default="xla", choices=["xla", "matmul"],
        help="1-D convolution compute path (same params/math): 'matmul' "
             "runs convs as shifted batched dot_generals.  A/B harness "
             "only — chip-measured WORSE than 'xla' everywhere, sequential "
             "and ganged (BENCH.md conv_impl sweep, r5)",
    )
    p.add_argument(
        "--no-device-cache", action="store_true",
        help="disable the process-level content-addressed device-corpus "
             "cache (data/device_cache.py) that makes grid members after "
             "the first re-upload nothing; values are bit-identical either "
             "way (tests/test_device_cache.py)",
    )
    args = p.parse_args(argv)

    dataset = utils.file2dict(args.dataset_file)
    base_cfg = TrainConfig(
        dataset=args.dataset,
        model=args.model,
        num_epochs=args.num_epochs,
        batch_size=args.batch_size,
        lr_max=args.lr_max,
        op=args.op,
        num_channels=args.num_channels,
        valid=args.valid,
        experiments_root=args.experiments_root,
        cvd_map=args.cvd_map_csv,
        compute_dtype=args.compute_dtype,
        steps_per_dispatch=args.steps_per_dispatch,
        n_devices=args.n_devices,
        checkpoint_every=args.checkpoint_every,
        eval_batch_size=args.eval_batch_size,
        sig_len=args.sig_len,
        classical_space=args.classical_space,
        latent_space=args.latent_space,
        true_seed=args.true_seed,
        conv_impl=args.conv_impl,
        device_cache=not args.no_device_cache,
    )
    run_grid(
        base_cfg,
        dataset,
        args.methods,
        args.n_fractions,
        args.seeds,
        seed_datas=args.seed_datas,
        robust=not args.no_robust,
        gang=args.gang,
        gang_devices=args.gang_devices,
        gang_max_size=args.gang_max_size,
        gang_fallback=not args.no_gang_fallback,
    )


if __name__ == "__main__":
    main()
