"""Gang training: one jitted program trains a whole seed grid at once.

The reference's published numbers are means over seed grids — ~10 runs per
(model, method, n_fraction) differing only in ``seed_data``
(read_experiments.py:20-59); it executes them strictly sequentially
(experiments_timeseries.ipynb cell 13).  On TPU that is the wrong shape: a
batch-64 run of a ≤9M-parameter CNN leaves most of the MXU idle, and every
run pays the full dispatch/collective overhead alone.

Gang mode instead ``jax.vmap``s the train step over a leading *member* axis
S and trains all S grid members simultaneously in one XLA program:

- the train corpus is staged in HBM ONCE (members' splits are row-subsets
  of the same base array — ``ArrayDataset.rows`` provenance maps each
  member's split-local batch indices to shared base rows);
- when the test split is identical across members (PhysioNet mode='test'
  ignores ``seed_data``, dataloader_physionet.py:27-39), eval tensors are
  staged once and ONE vmapped dispatch evaluates every member per plot
  epoch; members with UNEQUAL train sizes and/or per-member test folds
  (the UMC 10-fold case) train through the RAGGED path instead
  (:func:`_train_gang_ragged`) — lockstep epochs with masked no-op steps,
  per-member OneCycle tables, per-member padded eval staging;
- model init is identical across members (the reference fixes
  ``torch.manual_seed(seed_fix)`` with seed_fix=4 for the whole grid,
  train_model.py:222) — states start equal and diverge through the
  per-member data order and augmentation plans;
- augmentation plans are built host-side by one *per-member* engine each
  step (the step-seeded reference RNG protocol makes each member's plans
  bit-identical to its standalone run), stacked, and applied inside the
  vmapped step;
- each member still writes its own reference-contract run directory
  (performance.pkl, model.msgpack), so the results/reporting stack reads
  gang output unchanged.

Multi-chip: the member axis is embarrassingly parallel — sharding the
stacked state/batches on a 1-axis mesh ("gang") needs NO collectives at
all, unlike batch-axis DP which all-reduces gradients every step.  Pass
``n_devices`` > 1 (S must divide evenly).

Scope: the latentmixup/manifold split-forward methods gang — equal-size
members share member-uniform step-seeded draws and dispatch one per-depth
program per step like the single-run loop; RAGGED members' draws diverge
and dispatch per DRAW GROUP (one per-depth program per distinct draw per
lockstep position, masked to that draw's members).  The (salopt…) and
(closestknn/bins) methods gang through FROZEN-model planning hooks
(per-member pretrained saliency providers / the shared canonical embedding
fn — the runner wires both after training the dependency runs), each
member's hook running on its base-gathered device batch before the vmapped
update, in both the equal and ragged paths.  The LIVE-model methods
(lc-nointrusion / saliency-cutmix) gang in the EQUAL path: inside a gang
the "live training model" is the stacked member state itself, so one
vmapped dispatch per step scores every member's candidate pool (lc, the
4× fixed-shape pool of augmentations.py:1228-1259) or computes every
member's current-model saliency map (saliency-cutmix), the host runs each
member's standalone selection/binning code verbatim, and the vmapped
update trains on the per-member result — S live-model host round-trips
per step collapse into one.  Scan fusion applies only to hook-free
input-space methods, as in train_model.  Out of scope: RAGGED live-model
gangs (the per-member gates would diverge; train_gang raises and the
runner falls back to sequential runs).
:func:`gang_ineligible_reason` reports why a config must fall back to
:func:`pcgmix_tpu.train.loop.train_model`.

``times`` in each member's performance dict is the gang's wall-clock (the
members train concurrently, so that IS each member's elapsed time).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcgmix_tpu import utils
from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
from pcgmix_tpu.data import EpochIterator
from pcgmix_tpu.data.datasets import ArrayDataset
from pcgmix_tpu.exp.dirs import experiment_dir
from pcgmix_tpu.models import build_model
from pcgmix_tpu.train.loop import (
    TrainConfig,
    aggregate_recording_eval,
    build_splits,
    _selc_turnpoint,
    init_state,
    save_checkpoint,
    stage_eval,
)
from pcgmix_tpu.train.losses import init_selc_table
from pcgmix_tpu.train.metrics import PerformanceTracker, segment_accuracy
from pcgmix_tpu.train.steps import make_eval_step, make_optimizer, make_train_step

# config fields allowed to differ between gang members: seed_data selects the
# train subset, seed the epoch shuffle stream (with valid=False neither
# changes any static shape); everything else must match for one program to
# serve all members
_MEMBER_FIELDS = ("seed_data", "seed")


def gang_ineligible_reason(
    cfg: TrainConfig, model_hooks: bool = False
) -> Optional[str]:
    """Why this config cannot train in a gang (None = eligible).

    The constraints mirror the scan dispatch's (train/loop.py use_resident +
    scan_mode): every member's step must be a pure function of (state,
    indices, plan) with one static program shape.  Decidable from the config
    alone, so the grid runner can group eligible points before loading data.

    ``model_hooks=True`` declares the caller will supply the frozen-model
    planning hooks (per-member salopt saliency providers / the shared
    latent-embedding fn — what the runner wires after training the
    dependency runs), which makes the (salopt…) and (closestknn/bins)
    methods gang-eligible: their hooks read FROZEN checkpoints, so each
    member's plans stay a pure function of its batch, dispatched per step
    before the vmapped update (scan fusion off).
    """
    from pcgmix_tpu.augment.methods import parse_method

    if cfg.classical_space:
        return "classical_space dumps need host-side batch tensors"
    if cfg.latent_space:
        return "latent_space dumps need host-side batch tensors"
    if cfg.track_variability:
        return "variability tracking reads per-member host batches"
    spec = parse_method(cfg.method, spectrogram=cfg.spectrogram)
    # lc-nointrusion / saliency-cutmix ARE gang-eligible (live-model mode):
    # they read the LIVE training model, which inside a gang is the stacked
    # member state itself — one vmapped scoring/saliency dispatch per step
    # feeds per-member host planning, then the vmapped update.  Per-step
    # dispatch only (like the hook methods); the ragged path raises (equal
    # split sizes required) and the runner falls back to sequential runs.
    if spec.salopt is not None and not model_hooks:
        return ("saliency planning needs per-member pretrained providers "
                "(train_gang(saliency_model_providers=…); the runner's "
                "--gang wires them)")
    if spec.pairing in ("closestknn", "closestbins") and not model_hooks:
        return ("latent pairing needs the frozen embedding model "
                "(train_gang auto-resolves it once its canonical run "
                "exists; the runner's --gang trains it first)")
    # latentmixup/manifold-* ARE gang-eligible: the depth draw
    # (engine._latent_depth) and the '+p' gate both derive from the
    # step-seeded RNG protocol, so they are member-uniform — the gang
    # dispatches the per-depth split-forward step like the single-run loop
    # (per-step, never scanned)
    return None


def _validate_members(cfgs: list[TrainConfig]) -> None:
    base = dataclasses.asdict(cfgs[0])
    for f in _MEMBER_FIELDS:
        base.pop(f)
    for cfg in cfgs[1:]:
        d = dataclasses.asdict(cfg)
        for f in _MEMBER_FIELDS:
            d.pop(f)
        if d != base:
            diff = [k for k in d if d[k] != base[k]]
            raise ValueError(
                f"gang members may differ only in {_MEMBER_FIELDS}; "
                f"got differing fields {diff}"
            )


def group_gangable(
    cfgs: list[TrainConfig], dataset: Optional[dict] = None,
    model_hooks: bool = False,
) -> list[list[TrainConfig]]:
    """Bucket configs into gangs that can train as one program.

    Two configs share a bucket when they differ only in ``_MEMBER_FIELDS``
    and are gang-eligible.  Unequal train-split sizes and per-member test
    splits are handled by the ragged gang path (:func:`_train_gang_ragged`)
    for EVERY eligible method — including the latent split-forward and
    frozen-model-hook families, which it dispatches per draw group / with
    per-member hooks — so split shape never splits buckets.  Grouping is
    therefore CONFIG-ONLY: ``dataset`` is accepted (and ignored) for
    backward compatibility with the pre-ragged signature, which bucketed
    by probed split size.
    ``model_hooks`` mirrors :func:`gang_ineligible_reason`'s flag (the
    runner passes True because it wires the frozen-model providers).
    Singleton buckets (and ineligible configs) should run via
    :func:`pcgmix_tpu.train.loop.train_model`.  Bucket order follows first
    appearance; members keep input order.
    """
    del dataset  # config-only grouping (see docstring)
    groups: dict = {}
    order: list = []
    for cfg in cfgs:
        if gang_ineligible_reason(cfg, model_hooks=model_hooks) is not None:
            key = ("ineligible", id(cfg))
        else:
            d = dataclasses.asdict(cfg)
            for f in _MEMBER_FIELDS:
                d.pop(f)
            key = (repr(sorted(d.items(), key=lambda kv: kv[0])),)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(cfg)
    return [groups[k] for k in order]


def _base_train_dataset(cfg: TrainConfig, dataset: dict) -> ArrayDataset:
    """The shared from_dict base every member split's ``rows`` index into
    (physionet_split/umc_split build from this exact call before take());
    train_gang asserts base.label[rows] == split.label per member, so any
    future split-level transform drift fails loudly instead of training on
    wrong targets."""
    if cfg.dataset.startswith("PhysioNet"):
        return ArrayDataset.from_dict(
            dataset["train"], cfg.num_channels, False, cfg.spectrogram
        )
    if cfg.dataset.startswith("UMC"):
        from pcgmix_tpu.data.umc import swap_umc_labels

        ds = ArrayDataset.from_dict(
            dataset, cfg.num_channels, False, cfg.spectrogram
        )
        # umc_split rewrites labels right after from_dict — the shared base
        # must carry the same labels or gathered one-hot targets would be
        # class-inverted (caught by the provenance assert below)
        ds.label = swap_umc_labels(ds.label)
        return ds
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def _stack_trees(trees, axis=0):
    """Stack a list of same-structure plan trees; jax leaves stay on device."""
    return jax.tree_util.tree_map(
        lambda *xs: (
            jnp.stack(xs, axis=axis)
            if isinstance(xs[0], jax.Array)
            else np.stack([np.asarray(x) for x in xs], axis=axis)
        ),
        *trees,
    )


def _member_engines(cfgs: list[TrainConfig], train_sets) -> list[AugmentEngine]:
    """One planning engine per member (np_stream state advances per run);
    engines[0] doubles as the apply closure — apply() is a pure function of
    the plan arrays, no per-member state."""

    def make_engine(cfg):
        cvd_map = cfg.cvd_map
        if isinstance(cvd_map, str):
            from pcgmix_tpu.data.datasets import load_cvd_map

            cvd_map = load_cvd_map(cvd_map)
        return AugmentEngine(
            AugmentConfig(
                method=cfg.method,
                batch_size=cfg.batch_size,
                num_channels=train_sets[0].data.shape[1],
                sig_len=train_sets[0].data.shape[-1],
                num_classes=cfg.num_classes,
                sample_rate=cfg.sample_rate,
                spectrogram=cfg.spectrogram,
                spec_freq=train_sets[0].data.shape[-2] if cfg.spectrogram else 0,
                model=cfg.model,
                cvd_map=cvd_map,
                # default OFF under vmap: the XLA mix path is bit-identical
                # (tests/test_pallas_mix) and fuses fine.  An explicit
                # cfg.use_pallas=True opts in — jax batches the pallas_call
                # over the member axis (validated in interpret mode,
                # tests/test_gang.py::test_gang_pallas_interpret)
                use_pallas=bool(cfg.use_pallas),
                mesh=None,
                pallas_interpret=cfg.pallas_interpret,
            )
        )

    return [make_engine(cfg) for cfg in cfgs]


def _check_provenance(base_ds, cfgs, train_sets, member_rows) -> None:
    """Provenance integrity: the device step gathers data/targets from the
    shared base by rows — if a split-level transform (label swap,
    normalization, channel edit) diverged from the base rebuild, the members
    would silently train on wrong tensors."""
    for cfg, tr, rows in zip(cfgs, train_sets, member_rows):
        if not np.array_equal(base_ds.label[rows], tr.label):
            raise AssertionError(
                f"base/split label mismatch for seed_data={cfg.seed_data} "
                f"(split-level transform not mirrored in _base_train_dataset)"
            )
        li = np.arange(len(rows))[:: max(1, len(rows) // 8)][:8]
        if not np.array_equal(base_ds.data[rows[li]], tr.data[li]):
            raise AssertionError(
                f"base/split data mismatch for seed_data={cfg.seed_data}"
            )


def _open_gang_ckpt(cfg0: TrainConfig, run_dirs):
    """Periodic full-state checkpointing of the STACKED state (crash
    recovery, loop.py contract): one checkpoint for the whole gang, keyed
    by the member run dirs so the same cfg list resumes it."""
    if not (cfg0.checkpoint_every and all(d is not None for d in run_dirs)):
        return None
    import hashlib

    from pcgmix_tpu.train.checkpoint import CheckpointManager

    digest = hashlib.sha1("\n".join(run_dirs).encode()).hexdigest()[:16]
    return CheckpointManager(
        os.path.join(cfg0.experiments_root, ".gang_checkpoints", digest)
    )


def _cleanup_gang_ckpt(ckpt_mgr) -> None:
    """The members' run dirs are now the durable artifacts; a kept gang
    checkpoint would make a LATER rerun of the same grid (after the user
    deletes the run dirs to retrain) silently "resume" past all epochs from
    stale state — and stacked params+opt_state per gang would accumulate
    unboundedly."""
    if ckpt_mgr is None:
        return
    import shutil

    ckpt_dir = ckpt_mgr.directory
    ckpt_mgr.close()
    shutil.rmtree(ckpt_dir, ignore_errors=True)


def _emit_member_plot_epoch(
    cfg, perf, run_dir, epoch, steps, train_loss, train_acc,
    eval_member, staged_member, class_majority, times, lr_list,
):
    """One member's plot-epoch bookkeeping, shared by the equal and ragged
    gang paths (mirrors train_model's per-plot-epoch contract): metric adds,
    recording-level eval aggregation, performance.pkl save, and plots."""
    perf.add("epochs", epoch)
    perf.add("steps", steps)
    perf.add("train_loss", train_loss)
    perf.add("train_accuracy", train_acc)
    test_loss, metrics = aggregate_recording_eval(
        eval_member, staged_member, class_majority
    )
    perf.add("test_loss", test_loss)
    for k, v in metrics.items():
        perf.add(k, v)
    perf.add("times", float(np.sum(times)))
    if run_dir:
        utils.save_dict(perf.dict, os.path.join(run_dir, "performance.pkl"))
        if cfg.plot:
            from pcgmix_tpu.exp import plotters

            plotters.plot_train_test_acc(
                perf.dict["train_accuracy"], perf.dict["test_accuracy"],
                cfg.valid, perf.dict["steps"], run_dir,
            )
            plotters.plot_train_test_loss(
                perf.dict["train_loss"], perf.dict["test_loss"],
                cfg.valid, perf.dict["steps"], run_dir,
            )
            plotters.plot_lr_per_step(lr_list, run_dir)
            plotters.plot_times(
                times, list(range(1, len(times) + 1)), run_dir
            )


def _tree_bytes(tree) -> int:
    return sum(
        int(np.prod(l.shape)) * np.dtype(l.dtype).itemsize
        for l in jax.tree_util.tree_leaves(tree)
        if hasattr(l, "shape")
    )


def _jaxpr_intermediate_bytes(jaxpr) -> int:
    """Sum of every intermediate array a jaxpr produces, sub-jaxprs
    included — an UPPER bound on the program's activation footprint (XLA
    fuses and reuses buffers aggressively, see the ``reuse`` discount in
    :func:`estimate_gang_max_size`)."""
    total = 0
    for eqn in jaxpr.eqns:
        for v in eqn.outvars:
            aval = getattr(v, "aval", None)
            if aval is not None and getattr(aval, "shape", None) is not None:
                try:
                    itemsize = np.dtype(aval.dtype).itemsize
                except TypeError:
                    itemsize = 8  # extended dtypes (typed PRNG keys etc.)
                total += int(np.prod(aval.shape)) * itemsize
        for p in eqn.params.values():
            for sub in (p if isinstance(p, (tuple, list)) else (p,)):
                inner = getattr(sub, "jaxpr", None)
                if inner is not None:
                    total += _jaxpr_intermediate_bytes(inner)
    return total


def _abstract_variables(cfg: TrainConfig, batch_size: int,
                        sample_shape: Optional[tuple] = None):
    """(model, abstract sample, eval_shape'd variables) for ``cfg`` — the
    shared scaffold of the memory estimator and the profitability heuristic.

    ``sample_shape`` is the model-input shape EXCLUDING the batch axis; when
    None it is derived from the config, which for spectrograms assumes a
    square ``(1, sig_len, sig_len)`` image — callers that hold the data
    (the runner) pass the real row shape instead, since spec configs keep
    ``sig_len`` at its 1-D meaning."""
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    model = build_model(
        cfg.model, cfg.dataset, cfg.num_classes, train=True,
        compute_dtype=dtype, conv_impl=cfg.conv_impl,
    )
    if sample_shape is None:
        if cfg.spectrogram:
            sample_shape = (1, cfg.sig_len, cfg.sig_len)
        else:
            sample_shape = (cfg.num_channels, cfg.sig_len)
    sample = jax.ShapeDtypeStruct(
        (batch_size, *sample_shape), jnp.float32
    )
    variables = jax.eval_shape(
        lambda s: model.init(jax.random.PRNGKey(0), s), sample
    )
    return model, sample, variables


def estimate_gang_max_size(
    cfg: TrainConfig,
    train_size: int,
    corpus_bytes: int = 0,
    hbm_bytes: Optional[int] = None,
    reuse: float = 0.25,
    safety: float = 0.8,
    sample_shape: Optional[tuple] = None,
) -> int:
    """Default gang size cap from device memory (the reference's grids run
    up to 333 seeds per point, read_experiments.py:20-59 — a gang that size
    cannot hold S copies of params/opt-state/activations in HBM).

    Budget model, all per member unless noted:

    * **state** — params + batch_stats (exact, via ``jax.eval_shape`` of the
      model init) × (1 + opt-state copies: 2 for adam's μ/ν, 1 for SGD
      momentum) + the SELC soft-label table (train_size × num_classes f32);
    * **activations** — the summed intermediates of one forward+backward
      jaxpr (model-agnostic, traced abstractly — no compile, no device
      work), discounted by ``reuse`` for XLA's buffer reuse/fusion (0.25 is
      conservative against the production ResNet9 profile, where the
      compiled temp size is well under a fifth of the naive sum);
    * **shared** (once, not per member) — the staged base corpus
      (``corpus_bytes``) and the eval staging, covered by the ``safety``
      headroom together with XLA workspace.

    ``S_max = (hbm × safety − corpus) // per_member``, floored at 1.
    ``hbm_bytes`` defaults to the backend's reported limit
    (``device.memory_stats()['bytes_limit']``) or 8 GiB when the backend
    does not report one (CPU dryrun meshes).  The runner uses this as the
    ``--gang-max-size`` default; the manual flag overrides.
    """
    model, sample, variables = _abstract_variables(
        cfg, cfg.batch_size, sample_shape
    )
    opt_copies = 2 if cfg.op.lower() == "adam" else 1
    state_bytes = (
        _tree_bytes(variables) * (1 + opt_copies)
        + train_size * cfg.num_classes * 4
    )

    def loss_fn(params, bstats, x):
        # bstats rides as a traced ARGUMENT: captured eval_shape structs
        # cannot be used as constants inside make_jaxpr (BatchNorm's
        # running-average update would hit float * ShapeDtypeStruct).
        # rngs: dropout models (the Potes family) refuse train-mode apply
        # without a 'dropout' stream; harmless for the rest
        out = model.apply(
            {"params": params, "batch_stats": bstats},
            x, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        logits = out[0] if isinstance(out, tuple) else out
        return jnp.sum(jax.tree_util.tree_leaves(logits)[0])

    jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(
        variables["params"], variables.get("batch_stats", {}), sample
    )
    act_bytes = _jaxpr_intermediate_bytes(jaxpr.jaxpr) * reuse
    per_member = state_bytes + act_bytes

    if hbm_bytes is None:
        stats = jax.devices()[0].memory_stats() or {}
        hbm_bytes = stats.get("bytes_limit") or 8 * 1024**3
    budget = hbm_bytes * safety - corpus_bytes
    return max(1, int(budget // max(per_member, 1)))


def gang_profitable(cfg: TrainConfig, param_threshold: int = 1_000_000) -> bool:
    """Chip-data-backed steady-state profitability heuristic for ganging.

    Measured on the real TPU v5e (BENCH.md "Gang training",
    artifacts/bench_gang_{resnet9,potes}_r4.json +
    bench_gang_*_convsweep_r5.json): models small enough to leave the MXU
    idle at batch 64 gang at 2.4× the best sequential config (Potes, 130k
    params), while MXU-saturating models *lose* 0.79-0.91× (ResNet9, 6M
    params; re-measured 0.87-0.90× in the r5 sweep) because the vmapped
    per-member-weights convs lower to grouped contractions XLA tiles worse
    than S dense convs.  The purpose-built escape hatch —
    ``conv_impl="matmul"``, K shifted batched dot_generals — was
    chip-measured in r5 and LOSES outright (sequential 0.79×, gangs
    0.51-0.67× vs the xla-conv gang's 0.87-0.90×): XLA's native conv
    tiling beats the K-matmul decomposition even in the weight-batched
    case, so the crossover stands.  1M params stays the threshold between
    the two measured regimes.

    Advisory only, and about STEP throughput, not campaign wall-clock:
    the r5 campaign A/B (scripts/bench_campaign.py, BENCH.md "Campaign-
    level gang A/B") measured the full runner path and found 8-member
    ResNet9 gangs 2.6× faster at 8 epochs/member, 1.63× at 24, with the
    fitted per-epoch slopes reproducing the 0.87-0.90× step ratio and a
    break-even near E≈174 epochs/member — so at the paper's 50-epoch
    grids ganging wins campaign wall-clock for every model.  The runner
    gangs when asked and prints this signal rather than overriding the
    user.
    """
    _, _, variables = _abstract_variables(cfg, 1)
    params = sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(variables["params"])
    )
    return params < param_threshold


def _live_gang_step(
    state, engines, batches, idx_s, rows_s, step_count, epoch, rng, *,
    base_data, base_labels, num_classes, put,
    sal_vraw, lc_vscore, gang_step, gang_lc_step, gang_step_plain,
):
    """One gang step of a LIVE-model method (lc-nointrusion /
    saliency-cutmix): vmapped current-state scoring/saliency → per-member
    host planning (each member's standalone host code, verbatim) → vmapped
    update.  The '+p' gate draw is step-seeded, hence member-uniform."""
    base_m = engines[0].spec.base
    if base_m == "saliency-cutmix":
        from pcgmix_tpu import saliency as saliency_mod

        # lazy: the saliency dispatch only runs if the (member-uniform)
        # prob gate lets the handler run, exactly like the single-run
        # lambda (train/loop.py saliency_bins_fn)
        cache: dict = {}

        def bins_for(s):
            if "bins" not in cache:
                frames_s = np.stack([b["frames"] for b in batches])
                rows_dev = jnp.asarray(rows_s)
                data_S = jnp.take(base_data, rows_dev, axis=0)
                target_S = jax.nn.one_hot(
                    jnp.take(base_labels, rows_dev), num_classes,
                    dtype=base_data.dtype,
                )
                sal_S = np.asarray(sal_vraw(
                    state.params, state.batch_stats, data_S, target_S,
                    jnp.asarray(frames_s[:, :, -1]),
                ))
                cache["bins"] = [
                    saliency_mod.bin_training_saliency(sal_S[m], frames_s[m])
                    for m in range(len(batches))
                ]
            return cache["bins"][s]

        plans = [
            eng.plan(
                step_count, b["frames"], b["label"], b["wav"],
                saliency_bins_fn=(lambda s=s: bins_for(s)),
            )
            for s, (eng, b) in enumerate(zip(engines, batches))
        ]
    else:  # lc-nointrusion: planning itself is model-free
        plans = [
            eng.plan(step_count, b["frames"], b["label"], b["wav"])
            for eng, b in zip(engines, batches)
        ]

    gates = {p is None for p in plans}
    if len(gates) != 1:
        raise RuntimeError(
            f"step {step_count}: gang members disagree on the live-method "
            f"'+p' gate — protocol violation"
        )
    if plans[0] is None:
        return gang_step_plain(
            state, put(idx_s), put(rows_s), None, epoch, rng
        )
    arrays = _stack_trees([p.arrays for p in plans])
    if base_m == "saliency-cutmix":
        # row-count-preserving concat plan: the regular vmapped aug step
        return gang_step(
            state, put(idx_s), put(rows_s), put(arrays), epoch, rng
        )
    # lc-nointrusion: one vmapped dispatch scores all members' candidate
    # pools against their CURRENT params; host selection per member is the
    # standalone engine.lc_select, SELC scatters by the selected
    # candidates' source rows (global split-local ids), like train_model
    losses = np.asarray(lc_vscore(
        state.params, state.batch_stats, put(rows_s), put(arrays)
    ))
    sels, glob = [], []
    for s, (eng, p, b) in enumerate(zip(engines, plans, batches)):
        sel = eng.lc_select(
            losses[s], p.aux["cand_labels"], p.aux["n_per_class"]
        )
        sels.append(sel)
        glob.append(np.asarray(b["indices"])[np.asarray(p.arrays["idx1"])[sel]])
    arrays = dict(arrays)
    arrays["lc_sel"] = np.stack(sels)
    return gang_lc_step(
        state, put(np.stack(glob)), put(rows_s), put(arrays), epoch, rng
    )


def _finalize_members(cfgs, perfs, run_dirs, state, lr_lists):
    """Final per-member artifacts: model.msgpack + performance.pkl (the
    save is idempotent for normal completions and covers the
    resume-past-end edge — a crash between the final checkpoint and
    completion, where no plot epoch runs in the resumed process)."""
    for s, (cfg, perf) in enumerate(zip(cfgs, perfs)):
        member_state = jax.tree_util.tree_map(lambda x: x[s], state)
        if run_dirs[s]:
            save_checkpoint(
                os.path.join(run_dirs[s], "model.msgpack"), member_state
            )
            utils.save_dict(
                perf.dict, os.path.join(run_dirs[s], "performance.pkl")
            )
        perf.dict["lr_per_step"] = list(lr_lists[s])
    return [perf.dict for perf in perfs]


def train_gang(
    cfgs: list[TrainConfig],
    dataset: dict,
    *,
    n_devices: Optional[int] = None,
    progress: bool = False,
    saliency_model_providers: Optional[list] = None,
    latent_feature_fn=None,
) -> list[dict]:
    """Train all members simultaneously; returns one performance dict per
    member, each bit-compatible with :func:`train_model`'s output schema
    (metrics equal up to vmap-batched float reassociation).

    n_devices > 1 shards the member axis over a device mesh (zero-collective
    seed parallelism); len(cfgs) must divide evenly.  Note
    ``TrainConfig.n_devices`` (train_model's batch-axis data parallelism)
    does NOT apply inside a gang — the member axis is the parallel
    dimension here, controlled solely by this argument (the runner's
    ``--gang-devices``); batch-DP composes with vmap only as nested
    sharding, which these ≤9M-parameter models cannot use profitably.

    Frozen-model planning hooks (the runner wires these after training the
    dependency runs): ``saliency_model_providers`` — ONE provider per
    member for (salopt…) methods, each closing over that member's own
    pretrained checkpoint (saliency.make_pretrained_saliency_fn);
    ``latent_feature_fn`` — the SHARED frozen embedding fn for
    closestknn/bins pairing (auto-resolved from the canonical run dir when
    None, exactly like train_model).  Hook methods dispatch per step (no
    scan fusion): each member's device batch is gathered from the shared
    base, its hook runs, and the plan feeds the vmapped update — plans are
    bit-equal to the standalone runs (frozen checkpoints, same programs).
    """
    if not cfgs:
        raise ValueError("empty gang")
    utils.enable_compile_cache()  # warm-start the ~10-min tunnel compiles
    _validate_members(cfgs)
    cfg0 = cfgs[0]
    # hook methods are accepted here (providers enforced below); the
    # grouping-time decision is gang_ineligible_reason(model_hooks=False)
    reason = gang_ineligible_reason(cfg0, model_hooks=True)
    if reason is not None:
        raise ValueError(f"config not gang-eligible ({reason}); use train_model")
    S = len(cfgs)

    splits = [build_splits(cfg, dataset) for cfg in cfgs]
    train_sets = [tr for tr, _ in splits]
    test_ds = splits[0][1]
    for tr in train_sets:
        if tr.rows is None:
            raise ValueError("train split lacks row provenance (rows=None)")
    n_train = len(train_sets[0])
    ragged = any(len(tr) != n_train for tr in train_sets[1:]) or not all(
        np.array_equal(te.wav, test_ds.wav)
        and np.array_equal(te.label, test_ds.label)
        for _, te in splits[1:]
    )
    if ragged:
        # unequal train sizes and/or per-member test splits (the UMC
        # 10-fold case): lockstep program with masked no-op steps and
        # per-member schedule tables — exact per-member semantics, some
        # idle compute on the shorter members
        return _train_gang_ragged(
            cfgs, dataset, splits, n_devices=n_devices, progress=progress,
            saliency_model_providers=saliency_model_providers,
            latent_feature_fn=latent_feature_fn,
        )

    steps_per_epoch = n_train // cfg0.batch_size
    num_steps = cfg0.num_epochs * steps_per_epoch
    if num_steps == 0:
        raise ValueError("train split smaller than one batch")

    dtype = jnp.bfloat16 if cfg0.compute_dtype == "bfloat16" else None
    model = build_model(
        cfg0.model, cfg0.dataset, cfg0.num_classes, train=True,
        compute_dtype=dtype, conv_impl=cfg0.conv_impl,
    )
    model_eval = build_model(
        cfg0.model, cfg0.dataset, cfg0.num_classes, train=False,
        compute_dtype=dtype, conv_impl=cfg0.conv_impl,
    )
    tx = make_optimizer(
        cfg0.op, cfg0.lr_max, cfg0.weight_decay, cfg0.grad_clip,
        num_steps, cfg0.use_sched,
    )

    engines = _member_engines(cfgs, train_sets)
    base_ds = _base_train_dataset(cfg0, dataset)
    member_rows = [np.asarray(tr.rows, np.int64) for tr in train_sets]
    _check_provenance(base_ds, cfgs, train_sets, member_rows)
    # content-addressed reuse: sub-gang chunks and later grid points share
    # the same base corpus — skip the re-upload (data/device_cache.py)
    from pcgmix_tpu.data.device_cache import device_array as _put_corpus
    put_corpus = _put_corpus if cfg0.device_cache else jnp.asarray
    base_data = put_corpus(base_ds.data)
    base_labels = put_corpus(base_ds.label)

    needs_sal = engines[0].needs_pretrained_saliency
    needs_lat = engines[0].needs_latent_model
    if needs_sal and (
        saliency_model_providers is None
        or len(saliency_model_providers) != S
    ):
        raise ValueError(
            "(salopt…) gang needs ONE saliency provider per member, each "
            "closing over that member's own pretrained checkpoint — pass "
            "saliency_model_providers (saliency.make_pretrained_saliency_fn "
            "per cfg; the runner's --gang wires this after training the "
            "dependency runs)"
        )
    if needs_lat and latent_feature_fn is None:
        # auto-resolve the canonical frozen latent model, like train_model
        # (the run config carries no member fields, so one model serves all)
        from pcgmix_tpu.latent import latent_space_for

        latent_feature_fn = latent_space_for(cfg0).generate
    hook_mode = needs_sal or needs_lat

    selc_es = _selc_turnpoint(cfg0)
    raw_step = make_train_step(
        model, tx, selc_es=selc_es,
        engine=engines[0] if engines[0].enabled else None,
        train_data=base_data, train_labels=base_labels,
    )._raw_step

    # stacked state: identical init per member (the grid shares seed_fix),
    # per-member SELC tables from each member's own labels
    state0 = init_state(cfg0, model, train_sets[0], tx)
    state = jax.tree_util.tree_map(
        lambda x: jnp.repeat(jnp.asarray(x)[None], S, axis=0), state0
    )
    state = state.replace(
        soft_labels=jnp.stack(
            [init_selc_table(tr.label, cfg0.num_classes) for tr in train_sets]
        )
    )

    mesh = None
    if n_devices is not None and n_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pcgmix_tpu.parallel import make_mesh, shard_batch

        if S % n_devices:
            raise ValueError(
                f"gang size {S} must divide evenly over {n_devices} devices"
            )
        mesh = make_mesh(n_devices, axis="gang")
        state = jax.device_put(state, NamedSharding(mesh, P("gang")))

        def put(tree):
            return shard_batch(tree, mesh, axis="gang", axis_index=0)
    else:
        def put(tree):
            return jax.tree_util.tree_map(jnp.asarray, tree)

    enabled = engines[0].enabled
    # latentmixup/manifold split-forward methods dispatch per step through a
    # per-depth program (like train_model's latent_steps dict); the depth
    # draw and '+p' gate are step-seeded, hence member-uniform
    latent_mode = enabled and engines[0].spec.latent
    # live-model methods: the plan/selection reads the CURRENT member state
    # — per-step dispatch with one vmapped scoring/saliency pass per step
    lc_mode = enabled and engines[0].spec.base == "lc-nointrusion"
    live_mode = lc_mode or (
        enabled and engines[0].spec.base == "saliency-cutmix"
    )

    def _hook_kw(s, rows_np, frames):
        """Frozen-model planning kwargs for member s: the member's device
        batch, gathered from the shared base (bit-equal to its standalone
        staging — provenance-checked above), feeds its per-member saliency
        provider / the shared embedding fn."""
        if not hook_mode:
            return {}
        kw = {}
        rows_dev = jnp.asarray(rows_np)
        data_dev = jnp.take(base_data, rows_dev, axis=0)
        if needs_lat:
            kw["latent_fn"] = lambda d=data_dev: latent_feature_fn(d)
        if needs_sal:
            target_dev = jax.nn.one_hot(
                jnp.take(base_labels, rows_dev),
                cfg0.num_classes, dtype=base_data.dtype,
            )
            kw["saliency_fn"] = (
                lambda mix_model, s=s, d=data_dev, t=target_dev, f=frames:
                saliency_model_providers[s](mix_model)(d, t, f)
            )
        return kw

    def _vmapped(raw, with_plan):
        def member_step(st, idx, rows, plan, epoch, rng):
            return raw(st, {"indices": idx, "rows": rows}, plan, epoch, rng)

        return jax.jit(
            jax.vmap(
                member_step,
                in_axes=(0, 0, 0, 0 if with_plan else None, None, None),
            ),
            donate_argnums=(0,),
        )

    # in latent_mode the input-space raw_step is never dispatched (per-depth
    # split-forward steps and the plain gated step replace it); in lc_mode
    # the 4×-pool apply inside raw_step would train on the whole candidate
    # pool — the select-then-train step below replaces it
    gang_step = None if (latent_mode or lc_mode) else _vmapped(raw_step, enabled)
    latent_vsteps: dict = {}  # depth → vmapped per-depth split-forward step

    def latent_vstep(depth):
        if depth not in latent_vsteps:
            raw_l = make_train_step(
                model, tx, selc_es=selc_es, engine=engines[0],
                latent_depth=depth, manifold=engines[0].spec.manifold,
                model_eval=model_eval,
                train_data=base_data, train_labels=base_labels,
            )._raw_step
            latent_vsteps[depth] = _vmapped(raw_l, True)
        return latent_vsteps[depth]

    gang_step_plain = None
    if latent_mode or live_mode:
        # gated-off '+p' steps train plain (train_model uses step_plain)
        raw_plain = make_train_step(
            model, tx, selc_es=selc_es,
            train_data=base_data, train_labels=base_labels,
        )._raw_step
        gang_step_plain = _vmapped(raw_plain, False)

    lc_vscore = None       # (S-stacked state, rows, plan) → candidate losses
    gang_lc_step = None    # select-then-train step (lc-nointrusion)
    sal_vraw = None        # member-stacked current-model saliency maps
    if lc_mode:
        num_classes = cfg0.num_classes

        def _lc_batch(rows):
            rows = jnp.asarray(rows, jnp.int32)
            data = jnp.take(base_data, rows, axis=0)
            target = jax.nn.one_hot(
                jnp.take(base_labels, rows), num_classes, dtype=base_data.dtype
            )
            return data, target

        def _lc_losses(params, bstats, rows, plan):
            """Candidate-pool per-sample CE of the member's CURRENT model
            (the single-run sequence engine.apply → make_forward_loss,
            train/loop.py lc branch, fused into one program)."""
            data, target = _lc_batch(rows)
            cands, cand_t = engines[0].apply(data, target, plan)
            out = model_eval.apply(
                {"params": params, "batch_stats": bstats}, cands
            )
            logp = jax.nn.log_softmax(out, axis=1)
            return -jnp.sum(logp * cand_t, axis=1)

        lc_vscore = jax.jit(jax.vmap(_lc_losses, in_axes=(0, 0, 0, 0)))

        # direct-data plain step: the selected candidates are rebuilt
        # IN-STEP (recomputing the cheap mix beats shipping S×4B signals)
        plain_direct_raw = make_train_step(
            model, tx, selc_es=selc_es
        )._raw_step

        def _lc_raw(st, batch, plan, epoch, rng):
            data, target = _lc_batch(batch["rows"])
            arrays = {k: v for k, v in plan.items() if k != "lc_sel"}
            cands, cand_t = engines[0].apply(data, target, arrays)
            x = jnp.take(cands, plan["lc_sel"], axis=0)
            t = jnp.take(cand_t, plan["lc_sel"], axis=0)
            return plain_direct_raw(
                st, {"data": x, "target_ohe": t, "indices": batch["indices"]},
                None, epoch, rng,
            )

        gang_lc_step = _vmapped(_lc_raw, True)
    elif live_mode:  # saliency-cutmix
        from pcgmix_tpu import saliency as saliency_mod

        def _sal_raw(params, bstats, data, target, end):
            return saliency_mod.training_saliency_raw(
                model_eval, params, bstats, data, target, end
            )

        sal_vraw = jax.jit(jax.vmap(_sal_raw, in_axes=(0, 0, 0, 0, 0)))

    # hook and live methods dispatch per step: the frozen-model hook / the
    # live-model scoring must run on the CURRENT batch (and, for live
    # methods, the CURRENT state) before its plan exists, so steps cannot
    # pre-stack
    scan_k = (
        cfg0.steps_per_dispatch
        if not (latent_mode or hook_mode or live_mode) else 1
    )
    gang_multi = None
    if scan_k > 1:
        def member_multi(st, idx_seq, rows_seq, plan_seq, sids, epoch, rng):
            def body(s, xs):
                idx, rows, plan, sid = xs
                return raw_step(
                    s, {"indices": idx, "rows": rows}, plan, epoch,
                    jax.random.fold_in(rng, sid),
                )

            return jax.lax.scan(body, st, (idx_seq, rows_seq, plan_seq, sids))

        gang_multi = jax.jit(
            jax.vmap(
                member_multi,
                in_axes=(0, 0, 0, 0 if enabled else None, None, None, None),
            ),
            donate_argnums=(0,),
        )

    # one dispatch evaluates ALL members: vmap the eval step over the
    # stacked params/batch_stats, eval batches shared (the test split is
    # identical across members by validation above)
    eval_step = make_eval_step(model_eval)
    gang_eval_step = jax.jit(jax.vmap(eval_step, in_axes=(0, 0, None, None)))
    if cfg0.use_sched:
        from pcgmix_tpu.train.schedule import onecycle_lr

        lr_table = np.asarray(
            jax.vmap(onecycle_lr(num_steps, cfg0.lr_max))(jnp.arange(num_steps))
        )
    else:
        lr_table = np.full(num_steps, cfg0.lr_max, np.float32)

    run_dirs = [
        utils.check_folder(experiment_dir(cfg)) if cfg.save_artifacts else None
        for cfg in cfgs
    ]
    perfs = [PerformanceTracker() for _ in cfgs]
    epoch_plot = np.array(
        sorted(set(np.linspace(1, cfg0.num_epochs, 11).astype(int)))
    )
    base_key = jax.random.PRNGKey(cfg0.seed_fix)
    eval_staged = None
    step_count = 0
    start_epoch = 1
    times: list[float] = []
    lr_per_step: list[float] = []
    done = False

    ckpt_mgr = _open_gang_ckpt(cfg0, run_dirs)
    if ckpt_mgr is not None:
        if ckpt_mgr.latest_step() is not None:
            state, restored_step = ckpt_mgr.restore(state)
            step_count = restored_step
            start_epoch = step_count // steps_per_epoch + 1
            saved = ckpt_mgr.restore_metrics(restored_step)
            if saved:
                for perf, hist in zip(perfs, saved.get("perfs", [])):
                    for k, v in hist.items():
                        perf.dict[k] = list(v)
                times = list(saved.get("times", []))
                lr_per_step = list(saved.get("lr_per_step", []))
            from pcgmix_tpu.train.loop import (
                _engine_rng_replayable,
                replay_plan_rng,
            )

            if step_count and _engine_rng_replayable(engines[0]):
                # hook-free methods: bring each member engine's cross-step
                # RNG mirrors to where its uninterrupted run would be (exact
                # resume).  Hook methods (salopt/closest pairing) cannot
                # replay without their frozen-model hooks — post-resume
                # plans restart the mirror stream, matching train_model's
                # resume semantics for them (disclosed in PARITY.md)
                for eng, tr, cfg in zip(engines, train_sets, cfgs):
                    replay_plan_rng(eng, tr, cfg, step_count)
            if progress:
                print(f"gang resumed from checkpoint: step {step_count}, "
                      f"epoch {start_epoch}")

    for epoch in range(start_epoch, cfg0.num_epochs + 1):
        if cfg0.profile_dir and epoch == min(2, cfg0.num_epochs):
            jax.profiler.start_trace(cfg0.profile_dir)
        t0 = time.time()
        epoch_losses: list = []   # device arrays (S,) or (S, K)
        epoch_preds: list = []    # (S, B) or (S, K, B)
        epoch_targets: list = []
        iters = [
            iter(
                EpochIterator(
                    tr, cfg.batch_size, cfg.seed, step_count,
                    cfg.loader_parity, materialize_data=False,
                )
            )
            for tr, cfg in zip(train_sets, cfgs)
        ]
        buf_idx, buf_rows, buf_plans, buf_sids = [], [], [], []

        def flush(n_items):
            nonlocal state
            if n_items >= 2 and gang_multi is not None:
                idx_seq = np.stack(buf_idx[:n_items], axis=1)    # (S, K, B)
                rows_seq = np.stack(buf_rows[:n_items], axis=1)
                plan_seq = (
                    _stack_trees(buf_plans[:n_items], axis=1) if enabled else None
                )
                state, outs = gang_multi(
                    state, put(idx_seq), put(rows_seq),
                    put(plan_seq) if enabled else None,
                    jnp.asarray(buf_sids[:n_items]), epoch, base_key,
                )
                epoch_losses.append(outs["loss"])
                epoch_preds.append(outs["preds"])
                epoch_targets.append(outs["target"])
            else:
                for k in range(n_items):
                    state, out = gang_step(
                        state, put(buf_idx[k]), put(buf_rows[k]),
                        put(buf_plans[k]) if enabled else None, epoch,
                        jax.random.fold_in(base_key, buf_sids[k]),
                    )
                    epoch_losses.append(out["loss"][:, None])
                    epoch_preds.append(out["preds"][:, None])
                    epoch_targets.append(out["target"][:, None])
            del buf_idx[:n_items], buf_rows[:n_items]
            del buf_plans[:n_items], buf_sids[:n_items]

        for _ in range(steps_per_epoch):
            batches = [next(it) for it in iters]
            idx_s = np.stack([b["indices"] for b in batches])  # (S, B)
            rows_s = np.stack(
                [rows[b["indices"]] for rows, b in zip(member_rows, batches)]
            )
            if latent_mode:
                # hook_kw feeds closest-paired latent methods, e.g.
                # (closestknn=K)latentmixup — pairing needs the frozen
                # embedding fn exactly like train_model (loop.py plan call)
                plans = [
                    eng.plan(
                        step_count, b["frames"], b["label"], b["wav"],
                        **_hook_kw(s, rows_s[s], b["frames"]),
                    )
                    for s, (eng, b) in enumerate(zip(engines, batches))
                ]
                shapes = {
                    (p is not None, p.latent_depth if p is not None else None)
                    for p in plans
                }
                if len(shapes) != 1:
                    # the step-seeded protocol makes the gate/depth draws
                    # member-uniform; a mix would need per-member programs
                    raise RuntimeError(
                        f"step {step_count}: gang members disagree on the "
                        f"latent gate/depth ({shapes}) — protocol violation"
                    )
                rng = jax.random.fold_in(base_key, step_count)
                if plans[0] is None:
                    state, out = gang_step_plain(
                        state, put(idx_s), put(rows_s), None, epoch, rng
                    )
                else:
                    arrays = _stack_trees([p.arrays for p in plans])
                    state, out = latent_vstep(plans[0].latent_depth)(
                        state, put(idx_s), put(rows_s), put(arrays),
                        epoch, rng,
                    )
                epoch_losses.append(out["loss"][:, None])
                epoch_preds.append(out["preds"][:, None])
                epoch_targets.append(out["target"][:, None])
            elif live_mode:
                state, out = _live_gang_step(
                    state, engines, batches, idx_s, rows_s, step_count,
                    epoch, jax.random.fold_in(base_key, step_count),
                    base_data=base_data, base_labels=base_labels,
                    num_classes=cfg0.num_classes, put=put,
                    sal_vraw=sal_vraw, lc_vscore=lc_vscore,
                    gang_step=gang_step, gang_lc_step=gang_lc_step,
                    gang_step_plain=gang_step_plain,
                )
                epoch_losses.append(out["loss"][:, None])
                epoch_preds.append(out["preds"][:, None])
                epoch_targets.append(out["target"][:, None])
            else:
                buf_idx.append(idx_s)
                buf_rows.append(rows_s)
                if enabled:
                    arrs = [
                        eng.plan_arrays_or_identity(
                            step_count, b["frames"], b["label"], b["wav"],
                            **_hook_kw(s, rows_s[s], b["frames"]),
                        )[0]
                        for s, (eng, b) in enumerate(zip(engines, batches))
                    ]
                    buf_plans.append(_stack_trees(arrs))
                buf_sids.append(step_count)
            lr_per_step.append(float(lr_table[step_count]))
            step_count += 1
            if not latent_mode and len(buf_idx) == max(scan_k, 1):
                flush(len(buf_idx))
            if step_count >= num_steps:
                done = True
                break
        if buf_idx:
            # partial tail: a different-K scan would recompile — single steps
            flush_n = len(buf_idx)
            saved_multi, gang_multi = gang_multi, None
            flush(flush_n)
            gang_multi = saved_multi

        if epoch in epoch_plot and epoch_losses:
            jax.block_until_ready(epoch_losses[-1])
        times.append(time.time() - t0)
        if cfg0.profile_dir and epoch == min(2, cfg0.num_epochs):
            jax.profiler.stop_trace()
        if epoch in epoch_plot:
            losses_h, preds_h, targets_h = jax.device_get(
                (epoch_losses, epoch_preds, epoch_targets)
            )
            losses_np = np.concatenate(
                [np.atleast_2d(np.asarray(l)) for l in losses_h], axis=1
            )  # (S, steps)
            preds_np = np.concatenate(
                [np.asarray(p).reshape(S, -1) for p in preds_h], axis=1
            )
            targets_np = np.concatenate(
                [np.asarray(t).reshape(S, -1) for t in targets_h], axis=1
            )
            if eval_staged is None:
                eval_staged = stage_eval(
                    test_ds, cfg0.eval_batch_size, cfg0.num_classes
                )
            eval_out = jax.device_get([
                gang_eval_step(state.params, state.batch_stats, d, t)
                for d, t, _ in eval_staged
            ])  # per staged batch: probs (S, Bev, C), losses (S, Bev)
            for s, (cfg, perf) in enumerate(zip(cfgs, perfs)):
                _emit_member_plot_epoch(
                    cfg, perf, run_dirs[s], epoch, step_count,
                    float(losses_np[s].mean()),
                    segment_accuracy(preds_np[s], targets_np[s]),
                    [(probs[s], losses[s]) for probs, losses in eval_out],
                    eval_staged, engines[0].spec.class_majority,
                    times, lr_per_step,
                )
            if progress:
                accs = [p.dict["test_accuracy"][-1] for p in perfs]
                print(
                    f"epoch {epoch}: gang of {S}, "
                    f"test_acc mean={np.mean(accs):.2f} "
                    f"min={min(accs):.2f} max={max(accs):.2f}"
                )
        if ckpt_mgr is not None and epoch % cfg0.checkpoint_every == 0:
            ckpt_mgr.save(
                step_count, state,
                metrics={"perfs": [p.dict for p in perfs], "times": times,
                         "lr_per_step": lr_per_step},
            )
        if done:
            break

    out = _finalize_members(
        cfgs, perfs, run_dirs, state, [lr_per_step] * len(cfgs)
    )
    _cleanup_gang_ckpt(ckpt_mgr)
    return out


def _stage_eval_ragged(test_sets, cfg0, put):
    """Per-member eval staging, padded to a common batch count.

    Each member's test split is staged separately (ragged gangs have
    per-member held-out folds); members with fewer eval batches are padded
    by REUSING their first batch's tensors under an all-False validity mask,
    so one vmapped dispatch per batch position evaluates every member and
    the host aggregation drops the padding.  Returns
    ``(padded_staged, stacked)``: per-member staged lists (for
    aggregate_recording_eval) and the (S, Bev, …) device stacks."""
    staged = [
        stage_eval(te, cfg0.eval_batch_size, cfg0.num_classes,
                   device_put=np.asarray)
        for te in test_sets
    ]
    n_batches = max(len(x) for x in staged)
    padded = []
    for st_s in staged:
        pad = []
        if len(st_s) < n_batches:
            d0, t0, b0 = st_s[0]
            zb = dict(b0)
            zb["mask"] = np.zeros_like(b0["mask"])
            pad = [(d0, t0, zb)] * (n_batches - len(st_s))
        padded.append(list(st_s) + pad)
    stacked = [
        (
            put(np.stack([m[j][0] for m in padded])),
            put(np.stack([m[j][1] for m in padded])),
        )
        for j in range(n_batches)
    ]
    return padded, stacked


def _train_gang_ragged(
    cfgs: list[TrainConfig],
    dataset: dict,
    splits,
    *,
    n_devices: Optional[int] = None,
    progress: bool = False,
    saliency_model_providers: Optional[list] = None,
    latent_feature_fn=None,
) -> list[dict]:
    """Ragged gang: members may have UNEQUAL train-split sizes and
    PER-MEMBER test splits — the UMC 10-fold case (held-out patient groups
    of 3-4 patients give every fold a different train size and test set,
    data/umc.py HELDOUT_GROUPS), and PhysioNet seed_data subsets whose
    segment counts differ.

    Mechanism, preserving each member's standalone semantics exactly:

    - lockstep epochs of ``max(steps_per_epoch)`` steps; a member that has
      exhausted its own epoch re-feeds its last batch through the program as
      a masked NO-OP — the updated state is discarded per member via
      ``jnp.where(active, new, old)``, so params/opt-state/BN stats/SELC
      table/step counter stay untouched, exactly as if the step never ran;
    - OneCycle spans each member's OWN total step count: the lr/β₁ values
      ride ``optax.inject_hyperparams`` state as runtime inputs
      (steps.make_runtime_optimizer), indexed host-side by the member's own
      completed-update count — bit-equal to the count-baked schedule chain;
    - per-member RNG: the dropout key folds each member's OWN step id (a
      standalone run folds its global step_count), and each member's host
      plan engine is stepped only on its REAL steps, so plans and noise
      draws match the standalone runs bit-exactly;
    - eval stages every member's own test split, padded to a common batch
      count with zero-mask batches (:func:`_stage_eval_ragged`);
    - SELC tables are padded to the widest member (scatter indices are
      split-local, so padding rows are never touched).

    Cost: the shorter members idle for (max-own) steps per epoch — wasted
    compute bounded by the size spread, still far cheaper than training the
    spread members sequentially.

    Latent (split-forward) methods run ragged through PER-DRAW GROUPED
    dispatch: each member's depth/gate draw is seeded by its OWN step count
    (which diverges across unequal splits), so at each lockstep position the
    members are partitioned by their draw — gated-off/plain, or latent depth
    d — and one vmapped per-depth program is dispatched per distinct draw
    over the FULL stacked state, with the member mask selecting which
    members actually commit the update (the same ``jnp.where(active, …)``
    no-op machinery the raggedness itself uses).  Every member's plan,
    RNG fold, and schedule value stay bit-equal to its standalone run; the
    extra cost is (#distinct draws − 1) redundant vmapped steps per
    position — bounded by the model's depth fan-out (≤5), far below the S×
    cost of sequential runs.  Frozen-model hook methods (salopt / closest
    pairing) run ragged too: each ACTIVE member's hook runs on its own
    base-gathered device batch exactly as in the equal path (idle members
    reuse their cached identity template and consume no hook work).
    """
    cfg0 = cfgs[0]
    from pcgmix_tpu.augment.methods import parse_method as _parse

    if _parse(cfg0.method, spectrogram=cfg0.spectrogram).base in (
        "lc-nointrusion", "saliency-cutmix"
    ):
        # ragged members' '+p' gates are seeded by their OWN diverging step
        # counts, so the one-dispatch live scoring above has no uniform
        # gate; the runner catches this and falls back to sequential runs
        raise ValueError(
            "live-model methods (lc-nointrusion/saliency-cutmix) gang only "
            "with equal-size members; train these ragged points via "
            "train_model"
        )
    S = len(cfgs)
    train_sets = [tr for tr, _ in splits]
    test_sets = [te for _, te in splits]
    bs = cfg0.batch_size
    spe = [len(tr) // bs for tr in train_sets]
    if min(spe) == 0:
        raise ValueError("a member's train split is smaller than one batch")
    spe_max = max(spe)
    member_steps = [cfg0.num_epochs * k for k in spe]

    engines = _member_engines(cfgs, train_sets)
    enabled = engines[0].enabled
    needs_sal = engines[0].needs_pretrained_saliency
    needs_lat = engines[0].needs_latent_model
    if needs_sal and (
        saliency_model_providers is None
        or len(saliency_model_providers) != S
    ):
        raise ValueError(
            "(salopt…) gang needs ONE saliency provider per member — pass "
            "saliency_model_providers (the runner's --gang wires this "
            "after training the dependency runs)"
        )
    if needs_lat and latent_feature_fn is None:
        from pcgmix_tpu.latent import latent_space_for

        latent_feature_fn = latent_space_for(cfg0).generate
    hook_mode = needs_sal or needs_lat
    latent_mode = enabled and engines[0].spec.latent

    base_ds = _base_train_dataset(cfg0, dataset)
    member_rows = [np.asarray(tr.rows, np.int64) for tr in train_sets]
    _check_provenance(base_ds, cfgs, train_sets, member_rows)
    # content-addressed reuse: sub-gang chunks and later grid points share
    # the same base corpus — skip the re-upload (data/device_cache.py)
    from pcgmix_tpu.data.device_cache import device_array as _put_corpus
    put_corpus = _put_corpus if cfg0.device_cache else jnp.asarray
    base_data = put_corpus(base_ds.data)
    base_labels = put_corpus(base_ds.label)

    dtype = jnp.bfloat16 if cfg0.compute_dtype == "bfloat16" else None
    model = build_model(
        cfg0.model, cfg0.dataset, cfg0.num_classes, train=True,
        compute_dtype=dtype, conv_impl=cfg0.conv_impl,
    )
    model_eval = build_model(
        cfg0.model, cfg0.dataset, cfg0.num_classes, train=False,
        compute_dtype=dtype, conv_impl=cfg0.conv_impl,
    )

    if cfg0.use_sched:
        from pcgmix_tpu.train.schedule import onecycle_beta1, onecycle_lr
        from pcgmix_tpu.train.steps import make_runtime_optimizer

        tx, with_sched = make_runtime_optimizer(
            cfg0.op, cfg0.lr_max, cfg0.weight_decay, cfg0.grad_clip
        )
        lr_tables = [
            np.asarray(
                jax.vmap(onecycle_lr(ns, cfg0.lr_max))(jnp.arange(ns)),
                np.float32,
            )
            for ns in member_steps
        ]
        mom_tables = [
            np.asarray(jax.vmap(onecycle_beta1(ns))(jnp.arange(ns)), np.float32)
            for ns in member_steps
        ]
    else:
        # no count-baked closures to vary per member — the baked chain is
        # identical for every member (and bit-equal to train_model's)
        tx = make_optimizer(
            cfg0.op, cfg0.lr_max, cfg0.weight_decay, cfg0.grad_clip,
            max(member_steps), False,
        )
        with_sched = None
        lr_tables = [np.full(ns, cfg0.lr_max, np.float32) for ns in member_steps]
        mom_tables = None

    selc_es = _selc_turnpoint(cfg0)
    raw_step = make_train_step(
        model, tx, selc_es=selc_es,
        engine=engines[0] if enabled else None,
        train_data=base_data, train_labels=base_labels,
    )._raw_step

    # stacked state; per-member SELC tables padded to the widest member
    n_max = max(len(tr) for tr in train_sets)
    state0 = init_state(cfg0, model, train_sets[0], tx)

    def padded_table(tr):
        t = np.asarray(init_selc_table(tr.label, cfg0.num_classes))
        if len(tr) < n_max:
            t = np.concatenate(
                [t, np.zeros((n_max - len(tr), t.shape[1]), t.dtype)]
            )
        return t

    state = jax.tree_util.tree_map(
        lambda x: jnp.repeat(jnp.asarray(x)[None], S, axis=0),
        state0.replace(soft_labels=jnp.zeros((0,))),
    )
    state = state.replace(
        soft_labels=jnp.asarray(np.stack([padded_table(tr) for tr in train_sets]))
    )

    mesh = None
    if n_devices is not None and n_devices > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pcgmix_tpu.parallel import make_mesh, shard_batch

        if S % n_devices:
            raise ValueError(
                f"gang size {S} must divide evenly over {n_devices} devices"
            )
        mesh = make_mesh(n_devices, axis="gang")
        state = jax.device_put(state, NamedSharding(mesh, P("gang")))

        def put(tree):
            return shard_batch(tree, mesh, axis="gang", axis_index=0)
    else:
        def put(tree):
            return jax.tree_util.tree_map(jnp.asarray, tree)

    def make_body(raw):
        def body(st, idx, rows, plan, sid, lr, mom, active, epoch, rng):
            if with_sched is not None:
                st = st.replace(opt_state=with_sched(st.opt_state, lr, mom))
            new_st, out = raw(
                st, {"indices": idx, "rows": rows}, plan, epoch,
                jax.random.fold_in(rng, sid),
            )
            # masked no-op: discard the whole update for idle members (and
            # for members whose latent draw belongs to a different per-depth
            # dispatch; the select also blocks any NaN a garbage re-fed
            # batch could produce)
            new_st = jax.tree_util.tree_map(
                lambda a, b: jnp.where(active, a, b), new_st, st
            )
            return new_st, out

        return body

    def vmapped_body(raw, with_plan):
        return jax.jit(
            jax.vmap(
                make_body(raw),
                in_axes=(
                    0, 0, 0, 0 if with_plan else None, 0, 0, 0, 0, None, None
                ),
            ),
            donate_argnums=(0,),
        )

    member_body = make_body(raw_step)
    gang_step = vmapped_body(raw_step, enabled)

    # latent split-forward programs, one per distinct depth draw; the plain
    # program serves gated-off '+p' steps (train_model's step_plain)
    latent_ragged_steps: dict = {}

    def latent_gang_step(depth):
        if depth not in latent_ragged_steps:
            raw_l = make_train_step(
                model, tx, selc_es=selc_es, engine=engines[0],
                latent_depth=depth, manifold=engines[0].spec.manifold,
                model_eval=model_eval,
                train_data=base_data, train_labels=base_labels,
            )._raw_step
            latent_ragged_steps[depth] = vmapped_body(raw_l, True)
        return latent_ragged_steps[depth]

    gang_step_plain = None
    if latent_mode:
        raw_plain = make_train_step(
            model, tx, selc_es=selc_es,
            train_data=base_data, train_labels=base_labels,
        )._raw_step
        gang_step_plain = vmapped_body(raw_plain, False)

    # hook plans dispatch per step (the frozen-model hook runs on the
    # member's current batch); latent mode dispatches per draw group —
    # neither can pre-stack into a scan
    scan_k = (
        cfg0.steps_per_dispatch if not (latent_mode or hook_mode) else 1
    )
    gang_multi = None
    if scan_k > 1:
        def member_multi(
            st, idx_seq, rows_seq, plan_seq, sid_seq, lr_seq, mom_seq,
            act_seq, epoch, rng,
        ):
            def body(s, xs):
                idx, rows, plan, sid, lr, mom, active = xs
                return member_body(
                    s, idx, rows, plan, sid, lr, mom, active, epoch, rng
                )

            return jax.lax.scan(
                body, st,
                (idx_seq, rows_seq, plan_seq, sid_seq, lr_seq, mom_seq, act_seq),
            )

        gang_multi = jax.jit(
            jax.vmap(
                member_multi,
                in_axes=(0, 0, 0, 0 if enabled else None, 0, 0, 0, 0, None, None),
            ),
            donate_argnums=(0,),
        )

    # PhysioNet gangs are often ragged in TRAIN size only (mode='test'
    # ignores seed_data): stage the shared test split once and broadcast it
    # into the vmapped eval instead of S duplicate HBM copies
    tests_equal = all(
        np.array_equal(te.wav, test_sets[0].wav)
        and np.array_equal(te.label, test_sets[0].label)
        for te in test_sets[1:]
    )
    eval_step = make_eval_step(model_eval)
    gang_eval_step = jax.jit(jax.vmap(
        eval_step,
        in_axes=(0, 0, None, None) if tests_equal else (0, 0, 0, 0),
    ))

    run_dirs = [
        utils.check_folder(experiment_dir(cfg)) if cfg.save_artifacts else None
        for cfg in cfgs
    ]
    perfs = [PerformanceTracker() for _ in cfgs]
    epoch_plot = np.array(
        sorted(set(np.linspace(1, cfg0.num_epochs, 11).astype(int)))
    )
    base_key = jax.random.PRNGKey(cfg0.seed_fix)
    padded_staged = None
    eval_stacked = None
    msteps = [0] * S  # per-member REAL update counts
    start_epoch = 1
    times: list[float] = []
    lr_lists: list[list[float]] = [[] for _ in range(S)]

    ckpt_mgr = _open_gang_ckpt(cfg0, run_dirs)
    if ckpt_mgr is not None and ckpt_mgr.latest_step() is not None:
        state, restored_step = ckpt_mgr.restore(state)
        # gang checkpoints are taken at epoch boundaries, so the lockstep
        # step count factors exactly into completed epochs
        epochs_done = restored_step // spe_max
        start_epoch = epochs_done + 1
        msteps = [epochs_done * k for k in spe]
        saved = ckpt_mgr.restore_metrics(restored_step)
        if saved:
            for perf, hist in zip(perfs, saved.get("perfs", [])):
                for k, v in hist.items():
                    perf.dict[k] = list(v)
            times = list(saved.get("times", []))
            lr_lists = [list(x) for x in saved.get("lr_lists", lr_lists)]
        from pcgmix_tpu.train.loop import (
            _engine_rng_replayable,
            replay_plan_rng,
        )

        if _engine_rng_replayable(engines[0]):
            # hook engines (salopt / closest pairing) cannot replay without
            # their frozen-model hooks — post-resume plans restart the
            # mirror stream, matching train_model's resume semantics for
            # them (disclosed in PARITY.md); all other enabled engines
            # replay to their exact standalone position
            for eng, tr, cfg, ms in zip(engines, train_sets, cfgs, msteps):
                replay_plan_rng(eng, tr, cfg, ms)
        if progress:
            print(f"ragged gang resumed: epoch {start_epoch}, msteps {msteps}")

    for epoch in range(start_epoch, cfg0.num_epochs + 1):
        if cfg0.profile_dir and epoch == min(2, cfg0.num_epochs):
            jax.profiler.start_trace(cfg0.profile_dir)
        t0 = time.time()
        epoch_losses: list = []
        epoch_preds: list = []
        epoch_targets: list = []
        epoch_masks: list = []  # host (S, k) bool, aligned with the outputs
        iters = [
            iter(
                EpochIterator(
                    tr, bs, cfg.seed, msteps[s], cfg.loader_parity,
                    materialize_data=False,
                )
            )
            for s, (tr, cfg) in enumerate(zip(train_sets, cfgs))
        ]
        last_batch: list = [None] * S
        bufs = {k: [] for k in ("idx", "rows", "plans", "sids", "lrs",
                                "moms", "act")}

        def flush(n_items):
            nonlocal state
            acts = np.stack(bufs["act"][:n_items], axis=1)  # (S, K)
            if n_items >= 2 and gang_multi is not None:
                plan_seq = (
                    _stack_trees(bufs["plans"][:n_items], axis=1)
                    if enabled else None
                )
                state, outs = gang_multi(
                    state,
                    put(np.stack(bufs["idx"][:n_items], axis=1)),
                    put(np.stack(bufs["rows"][:n_items], axis=1)),
                    put(plan_seq) if enabled else None,
                    put(np.stack(bufs["sids"][:n_items], axis=1)),
                    put(np.stack(bufs["lrs"][:n_items], axis=1)),
                    put(np.stack(bufs["moms"][:n_items], axis=1)),
                    put(acts),
                    epoch, base_key,
                )
                epoch_losses.append(outs["loss"])
                epoch_preds.append(outs["preds"])
                epoch_targets.append(outs["target"])
                epoch_masks.append(acts)
            else:
                for k in range(n_items):
                    state, out = gang_step(
                        state, put(bufs["idx"][k]), put(bufs["rows"][k]),
                        put(bufs["plans"][k]) if enabled else None,
                        put(bufs["sids"][k]), put(bufs["lrs"][k]),
                        put(bufs["moms"][k]), put(bufs["act"][k]),
                        epoch, base_key,
                    )
                    epoch_losses.append(out["loss"][:, None])
                    epoch_preds.append(out["preds"][:, None])
                    epoch_targets.append(out["target"][:, None])
                    epoch_masks.append(bufs["act"][k][:, None])
            for v in bufs.values():
                del v[:n_items]

        def hook_kw(s, rows_np, frames):
            """Frozen-model planning kwargs for member s, mirroring the
            equal path: the member's device batch gathered from the shared
            base feeds its per-member saliency provider / the shared
            embedding fn."""
            if not hook_mode:
                return {}
            kw = {}
            rows_dev = jnp.asarray(rows_np)
            data_dev = jnp.take(base_data, rows_dev, axis=0)
            if needs_lat:
                kw["latent_fn"] = lambda d=data_dev: latent_feature_fn(d)
            if needs_sal:
                target_dev = jax.nn.one_hot(
                    jnp.take(base_labels, rows_dev),
                    cfg0.num_classes, dtype=base_data.dtype,
                )
                kw["saliency_fn"] = (
                    lambda mix_model, s=s, d=data_dev, t=target_dev,
                    f=frames:
                    saliency_model_providers[s](mix_model)(d, t, f)
                )
            return kw

        for k in range(spe_max):
            idx_r, rows_r, plan_r, latent_plans = [], [], [], []
            sid_r, lr_r, mom_r, act_r = [], [], [], []
            for s in range(S):
                active = k < spe[s]
                if active:
                    b = next(iters[s])
                    last_batch[s] = b
                else:
                    b = last_batch[s]  # masked no-op re-feed
                idx_r.append(b["indices"])
                rows_np = member_rows[s][b["indices"]]
                rows_r.append(rows_np)
                if latent_mode:
                    # per-member draw: each member's own step id seeds its
                    # gate/depth, diverging across ragged members — grouped
                    # per-draw dispatch below.  hook_kw feeds closest-paired
                    # latent methods, e.g. (closestknn=K)latentmixup
                    latent_plans.append(
                        engines[s].plan(
                            msteps[s], b["frames"], b["label"], b["wav"],
                            **hook_kw(s, rows_np, b["frames"]),
                        )
                        if active else None
                    )
                elif enabled:
                    if active:
                        arr, _ = engines[s].plan_arrays_or_identity(
                            msteps[s], b["frames"], b["label"], b["wav"],
                            **hook_kw(s, rows_np, b["frames"]),
                        )
                    else:
                        # consumes no engine RNG (identity_arrays snapshots
                        # the mirror stream) — the member's plan trajectory
                        # stays bit-equal to its standalone run.  Hook kwargs
                        # only matter on the one-time template build, so a
                        # cached template skips the per-idle-step device
                        # gather entirely.
                        arr = engines[s].identity_arrays(
                            msteps[s], b["frames"], b["label"], b["wav"],
                            **(
                                {}
                                if engines[s].has_identity_template(
                                    b["frames"], b["label"]
                                )
                                else hook_kw(s, rows_np, b["frames"])
                            ),
                        )
                    plan_r.append(arr)
                sid_r.append(msteps[s])
                if active:
                    lr = float(lr_tables[s][msteps[s]])
                    mom = float(
                        mom_tables[s][msteps[s]]
                    ) if mom_tables is not None else 0.0
                    lr_lists[s].append(lr)
                    msteps[s] += 1
                else:
                    lr, mom = 0.0, 0.0
                lr_r.append(lr)
                mom_r.append(mom)
                act_r.append(active)
            if latent_mode:
                # partition members by their draw (None = gated-off/plain,
                # d = latent depth); dispatch one program per distinct draw
                # over the full stacked state, masked to that draw's members
                act_np = np.asarray(act_r)
                draw_of = [
                    (p.latent_depth if p is not None else None)
                    for p in latent_plans
                ]
                draws = []
                for s in range(S):
                    if act_np[s] and draw_of[s] not in draws:
                        draws.append(draw_of[s])
                if not draws:  # every member idle (cannot happen: spe_max)
                    draws = [None]
                idx_s, rows_s = np.stack(idx_r), np.stack(rows_r)
                sids = np.asarray(sid_r, np.int32)
                lrs = np.asarray(lr_r, np.float32)
                moms = np.asarray(mom_r, np.float32)
                for draw in draws:
                    # every dispatch runs the FULL stacked state; the mask
                    # commits updates only for this draw's active members
                    # (idle members and other-draw members are computed but
                    # discarded — same no-op machinery as raggedness itself)
                    mask = np.array([
                        act_np[s] and draw_of[s] == draw for s in range(S)
                    ])
                    if draw is None:
                        state, out = gang_step_plain(
                            state, put(idx_s), put(rows_s), None,
                            put(sids), put(lrs), put(moms), put(mask),
                            epoch, base_key,
                        )
                    else:
                        donor = int(np.argmax(mask))
                        arrays = _stack_trees([
                            (latent_plans[s].arrays if mask[s]
                             else latent_plans[donor].arrays)
                            for s in range(S)
                        ])
                        state, out = latent_gang_step(draw)(
                            state, put(idx_s), put(rows_s), put(arrays),
                            put(sids), put(lrs), put(moms), put(mask),
                            epoch, base_key,
                        )
                    epoch_losses.append(out["loss"][:, None])
                    epoch_preds.append(out["preds"][:, None])
                    epoch_targets.append(out["target"][:, None])
                    epoch_masks.append(mask[:, None])
                continue
            bufs["idx"].append(np.stack(idx_r))
            bufs["rows"].append(np.stack(rows_r))
            if enabled:
                bufs["plans"].append(_stack_trees(plan_r))
            bufs["sids"].append(np.asarray(sid_r, np.int32))
            bufs["lrs"].append(np.asarray(lr_r, np.float32))
            bufs["moms"].append(np.asarray(mom_r, np.float32))
            bufs["act"].append(np.asarray(act_r))
            if len(bufs["idx"]) == max(scan_k, 1):
                flush(len(bufs["idx"]))
        if bufs["idx"]:
            # partial tail: a different-K scan would recompile — single steps
            n_tail = len(bufs["idx"])
            saved_multi, gang_multi = gang_multi, None
            flush(n_tail)
            gang_multi = saved_multi

        if epoch in epoch_plot and epoch_losses:
            jax.block_until_ready(epoch_losses[-1])
        times.append(time.time() - t0)
        if cfg0.profile_dir and epoch == min(2, cfg0.num_epochs):
            jax.profiler.stop_trace()
        if epoch in epoch_plot:
            losses_h, preds_h, targets_h = jax.device_get(
                (epoch_losses, epoch_preds, epoch_targets)
            )
            losses_np = np.concatenate(
                [np.atleast_2d(np.asarray(l)) for l in losses_h], axis=1
            )  # (S, lockstep steps this epoch)
            preds_np = np.concatenate(
                [np.asarray(p).reshape(S, -1) for p in preds_h], axis=1
            )
            targets_np = np.concatenate(
                [np.asarray(t).reshape(S, -1) for t in targets_h], axis=1
            )
            mask_np = np.concatenate(epoch_masks, axis=1).astype(bool)
            if eval_stacked is None:
                if tests_equal:
                    shared = stage_eval(
                        test_sets[0], cfg0.eval_batch_size, cfg0.num_classes
                    )
                    padded_staged = [shared] * S
                    eval_stacked = [(d, t) for d, t, _ in shared]
                else:
                    padded_staged, eval_stacked = _stage_eval_ragged(
                        test_sets, cfg0, put
                    )
            eval_out = jax.device_get([
                gang_eval_step(state.params, state.batch_stats, d, t)
                for d, t in eval_stacked
            ])  # per batch position: probs (S, Bev, C), losses (S, Bev)
            for s, (cfg, perf) in enumerate(zip(cfgs, perfs)):
                m = mask_np[s]
                row_m = np.repeat(m, bs)
                _emit_member_plot_epoch(
                    cfg, perf, run_dirs[s], epoch, msteps[s],
                    float(losses_np[s][m].mean()),
                    segment_accuracy(preds_np[s][row_m], targets_np[s][row_m]),
                    [(probs[s], losses[s]) for probs, losses in eval_out],
                    padded_staged[s], engines[0].spec.class_majority,
                    times, lr_lists[s],
                )
            if progress:
                accs = [p.dict["test_accuracy"][-1] for p in perfs]
                print(
                    f"epoch {epoch}: ragged gang of {S} "
                    f"(spe {spe}), test_acc mean={np.mean(accs):.2f} "
                    f"min={min(accs):.2f} max={max(accs):.2f}"
                )
        if ckpt_mgr is not None and epoch % cfg0.checkpoint_every == 0:
            ckpt_mgr.save(
                epoch * spe_max, state,
                metrics={"perfs": [p.dict for p in perfs], "times": times,
                         "lr_lists": lr_lists},
            )

    out = _finalize_members(cfgs, perfs, run_dirs, state, lr_lists)
    _cleanup_gang_ckpt(ckpt_mgr)
    return out
