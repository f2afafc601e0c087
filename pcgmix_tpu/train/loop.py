"""The training loop — functional equivalent of train_model
(train_model.py:197-488) rebuilt around jitted steps.

Per-batch flow: host builds the augmentation plan (tiny, reference-exact
RNG), then ONE jitted step runs augment+forward+loss+update on device.
Metrics are recorded at the reference's 11 linspaced "plot epochs"
(train_model.py:424-426) into the same performance-dict schema, pickled to
``performance.pkl`` in a run directory with the reference naming contract.
"""

from __future__ import annotations

import dataclasses
import os
import re
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcgmix_tpu import utils
from pcgmix_tpu.augment.engine import AugmentConfig, AugmentEngine
from pcgmix_tpu.data import EpochIterator, eval_batches, physionet_split, umc_split
from pcgmix_tpu.exp.dirs import experiment_dir
from pcgmix_tpu.models import build_model
from pcgmix_tpu.train.losses import init_selc_table
from pcgmix_tpu.train.metrics import (
    PerformanceTracker,
    recording_level_eval,
    segment_accuracy,
)
from pcgmix_tpu.train.steps import (
    TrainState,
    make_eval_step,
    make_forward_loss,
    make_optimizer,
    make_train_step,
)

SPECTROGRAM_DATASETS = ("PhysioNet(spec128)", "UMC(spec128)", "UMC(spec64)")


@dataclasses.dataclass
class TrainConfig:
    """The reference args namespace as a typed config
    (experiments_timeseries.ipynb cell 4 defaults)."""

    dataset: str = "PhysioNet"
    model: str = "resnet9"
    method: str = "base"
    num_epochs: int = 50
    batch_size: int = 64
    n_fraction: float = 1.0
    op: str = "adam"
    use_sched: bool = True
    lr_max: float = 0.01
    train_balance: bool = True
    num_channels: int = 4
    grad_clip: float = 0.1
    seed_data: int = 1100001
    valid: bool = False
    seed: int = 1
    seed_fix: int = 4
    weight_decay: float = 1e-4
    sample_rate: int = 1000
    num_classes: int = 2
    sig_len: int = 2500
    experiments_root: str = "experiments"
    latent_space: bool = False
    classical_space: bool = False
    loader_parity: str = "torch"  # epoch-order parity mode
    save_artifacts: bool = True
    plot: bool = True  # write accuracy/loss/lr/times jpgs to the run dir
    track_variability: bool = False  # variability counter + plot (see counters)
    checkpoint_every: int = 0  # epochs between orbax full-state checkpoints
                               # (0 = final-weights-only, reference behavior)
    compute_dtype: str = "float32"  # "bfloat16" = full-rate MXU throughput
                                    # mode (ResNet9 paths); float32 keeps
                                    # reference numerical parity
    profile_dir: Optional[str] = None  # capture a jax.profiler trace of
                                       # epoch 2 into this directory
    use_pallas: Optional[bool] = None  # TPU lane-rotation kernel for the
                                       # piecewise mixes; None = auto (on for
                                       # a TPU backend — bit-identical to the
                                       # XLA path, see tests/test_pallas_mix).
                                       # Under a DP mesh the kernels run via
                                       # shard_map with XLA pre-gathered
                                       # partner rows (tests/test_parallel)
    pallas_interpret: bool = False  # run Pallas kernels in interpret mode
                                    # (CPU CI exercise of the kernel path)
    torch_init: bool = False  # bit-parity fresh-run mode: initialize from
                              # torch's RNG under manual_seed(seed_fix) via
                              # train.convert.torch_seeded_init (ResNet9
                              # presets; reference train_model.py:293)
    steps_per_dispatch: int = 1  # >1: fuse K steps per dispatch via lax.scan
                                 # (device-resident methods only; gated-off
                                 # steps ride as identity plans)
    conv_impl: str = "xla"  # "matmul": 1-D convs as shifted dot_generals
                            # (same params/math to reassociation level) —
                            # the weight-batched gang fast path where XLA's
                            # grouped-conv lowering of a vmapped conv
                            # underuses the MXU (BENCH.md gang table);
                            # honored by ResNet9-1D/Potes, ignored elsewhere
    eval_batch_size: int = 1000
    device_cache: bool = True  # reuse committed device buffers for equal-
                               # content corpora across train_model calls in
                               # one process (grid members differing only in
                               # seed re-upload nothing; data/device_cache.py)
    cvd_map: Optional[object] = None  # dict wav→diagnosis, or a cvds_map.csv
                                      # path (augmentations.py:26-28)
    true_seed: Optional[int] = None  # override of the hardcoded train-balance
                                     # sampling seed 18 (dataloader_physionet
                                     # .py:82-84); the seed-sensitivity study
                                     # names runs 'base-trueseed=N'
                                     # (experiments_timeseries.ipynb cell 11)
                                     # — None also derives N from that label
    n_devices: Optional[int] = None  # data-parallel devices; None = all
                                     # visible (the reference wraps every run
                                     # in nn.DataParallel, train_model.py:385)
                                     # 1 = single-device, no mesh

    @property
    def spectrogram(self) -> bool:
        return self.dataset in SPECTROGRAM_DATASETS


def build_splits(cfg: TrainConfig, dataset: dict):
    """Train/test(/valid) split resolution (train_model.py:228-256)."""
    common = dict(
        num_channels=cfg.num_channels,
        seed_data=cfg.seed_data,
        seed=cfg.seed,
        valid=cfg.valid,
        classical_space=cfg.classical_space,
        spectrogram=cfg.spectrogram,
    )
    if cfg.dataset.startswith("PhysioNet"):
        tbal_seed = cfg.true_seed
        if tbal_seed is None and "trueseed=" in cfg.method:
            # the notebook sets args.true_seed=N AND labels the run
            # 'base-trueseed=N'; deriving N from the label keeps the run-dir
            # contract and the sampling behavior in sync for CLI runs
            m = re.search(r"trueseed=(\d+)", cfg.method)
            if m:
                tbal_seed = int(m.group(1))
        if tbal_seed is None:
            tbal_seed = 18  # dataloader_physionet.py:81 hardcoded
        train = physionet_split(
            dataset, "train", n_fraction=cfg.n_fraction,
            train_balance=cfg.train_balance, tbal_seed=tbal_seed, **common,
        )
        # eval splits never carry the extra classical channel
        # (dataloader_physionet.py:246 passes classical_space=False)
        test = physionet_split(
            dataset, "valid" if cfg.valid else "test",
            n_fraction=cfg.n_fraction, train_balance=cfg.train_balance,
            tbal_seed=tbal_seed, **{**common, "classical_space": False},
        )
    elif cfg.dataset.startswith("UMC"):
        common.pop("classical_space")
        train = umc_split(dataset, "train", classical_space=cfg.classical_space, **common)
        test = umc_split(dataset, "valid" if cfg.valid else "test", **common)
    else:
        raise ValueError(f"unknown dataset {cfg.dataset!r}")
    return train, test


def _selc_turnpoint(cfg: TrainConfig) -> int:
    """SELC activates after 40% of epochs when 'SELC' is in the method,
    otherwise never (train_model.py:394-401)."""
    if "SELC" in cfg.method:
        return int(cfg.num_epochs * 0.4)
    return cfg.num_epochs + 1


def init_state(cfg: TrainConfig, model, train_ds, tx) -> TrainState:
    shape = list(train_ds.data.shape[1:])
    if cfg.classical_space and not cfg.spectrogram:
        shape[0] = cfg.num_channels  # the model sees 4 of the 5 channels
    sample = jnp.zeros((1, *shape), jnp.float32)
    if cfg.torch_init:
        # opt-in bit-parity fresh-run mode: draw the reference's exact init
        # tensors with torch's RNG under manual_seed(seed_fix)
        # (train_model.py:293) instead of the distributional flax init
        if cfg.spectrogram:
            raise NotImplementedError(
                "torch_init draws the 1-D ResNet9 init tensors; the 2-D "
                "(spectrogram) models are not covered — transplant a torch "
                "checkpoint via train.convert.load_torch_checkpoint instead"
            )
        from pcgmix_tpu.train.convert import torch_seeded_init

        variables = jax.tree_util.tree_map(
            jnp.asarray,
            torch_seeded_init(
                cfg.model, shape[0], shape[-1], cfg.num_classes,
                seed=cfg.seed_fix,
            ),
        )
    else:
        variables = model.init(jax.random.PRNGKey(cfg.seed_fix), sample)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        soft_labels=init_selc_table(train_ds.label, cfg.num_classes),
        step=jnp.asarray(0, jnp.int32),
    )


def train_model(
    cfg: TrainConfig,
    dataset: dict,
    *,
    saliency_model_provider: Optional[Callable] = None,
    latent_feature_fn: Optional[Callable] = None,
    latent_space_model=None,
    progress: bool = False,
) -> dict:
    """Train one configuration end-to-end; returns the performance dict.

    saliency_model_provider(salopt_model:int) → callable(data, target,
    frames) → (B, T) saliency maps, for the (salopt…) methods; see
    pcgmix_tpu.saliency.make_pretrained_saliency_fn.
    latent_feature_fn(data) → (B, D) embeddings for closestknn/bins pairing.
    """
    utils.enable_compile_cache()  # warm-start the ~10-min tunnel compiles
    run_dir = None
    if cfg.save_artifacts:
        run_dir = utils.check_folder(experiment_dir(cfg))

    train_ds, test_ds = build_splits(cfg, dataset)
    steps_per_epoch = len(train_ds) // cfg.batch_size
    num_steps = cfg.num_epochs * steps_per_epoch
    if num_steps == 0:
        raise ValueError("train split smaller than one batch")

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    model = build_model(
        cfg.model, cfg.dataset, cfg.num_classes, train=True, compute_dtype=dtype,
        conv_impl=cfg.conv_impl,
    )
    model_eval = build_model(
        cfg.model, cfg.dataset, cfg.num_classes, train=False, compute_dtype=dtype,
        conv_impl=cfg.conv_impl,
    )

    tx = make_optimizer(
        cfg.op, cfg.lr_max, cfg.weight_decay, cfg.grad_clip, num_steps, cfg.use_sched
    )
    state = init_state(cfg, model, train_ds, tx)
    if progress:
        from pcgmix_tpu.models.registry import count_parameters

        # parity: the reference prints this at train start (train_model.py:387)
        print(f"\tModel parameters count: {count_parameters(state.params)}")

    # Data parallelism lives INSIDE the loop (the reference wraps the model
    # in nn.DataParallel unconditionally, train_model.py:385): replicate the
    # train state over a 1-axis device mesh and shard every batch-shaped
    # upload on the leading axis; GSPMD inserts the gradient all-reduce and
    # cross-shard mixing gathers.
    n_dev = cfg.n_devices if cfg.n_devices is not None else jax.local_device_count()
    mesh = None
    if n_dev > 1:
        from pcgmix_tpu.parallel import make_mesh, replicate, shard_batch

        mesh = make_mesh(n_dev)
        state = replicate(state, mesh)

        def put_batch(tree):
            return shard_batch(tree, mesh)

        def put_scan(tree):
            # scan stacks are (K, B, ...): shard axis 1 (batch), replicate
            # scalars/per-step leaves
            return shard_batch(tree, mesh, axis_index=1)
    else:
        def put_batch(tree):
            return jax.tree_util.tree_map(jnp.asarray, tree)

        put_scan = put_batch

    cvd_map = cfg.cvd_map
    if isinstance(cvd_map, str):
        from pcgmix_tpu.data.datasets import load_cvd_map

        cvd_map = load_cvd_map(cvd_map)
    engine = AugmentEngine(
        AugmentConfig(
            method=cfg.method,
            batch_size=cfg.batch_size,
            # classical_space adds the wide band as a 5th channel; the
            # augmentation operates on ALL channels (train_model.py:504-532)
            num_channels=train_ds.data.shape[1],
            sig_len=train_ds.data.shape[-1],
            num_classes=cfg.num_classes,
            sample_rate=cfg.sample_rate,
            spectrogram=cfg.spectrogram,
            spec_freq=train_ds.data.shape[-2] if cfg.spectrogram else 0,
            model=cfg.model,
            cvd_map=cvd_map,
            # auto: on for TPU backends.  Under a DP mesh the engine routes
            # through shard_map with XLA pre-gathered partner rows (GSPMD
            # cannot partition the opaque pallas_call directly, so the
            # cross-shard pair gather happens outside the kernel).
            use_pallas=(
                jax.default_backend() == "tpu"
                if cfg.use_pallas is None else cfg.use_pallas
            ),
            mesh=mesh,
            pallas_interpret=cfg.pallas_interpret,
        )
    )
    if engine.needs_latent_model and latent_feature_fn is None:
        # auto-resolve the reference's canonical frozen latent model
        # (latent_space.py:27-29); raises with a runner pointer if its run
        # doesn't exist yet
        from pcgmix_tpu.latent import latent_space_for

        _lat = latent_space_for(cfg)
        latent_feature_fn = _lat.generate
    selc_es = _selc_turnpoint(cfg)
    model_channels = cfg.num_channels if cfg.classical_space else None
    # Device-resident corpus: stage the whole training array in HBM once and
    # gather batches inside the jitted step, unless the loop itself must read
    # batch tensors on host (analysis hooks, model-in-the-loop methods).
    use_resident = not (
        cfg.classical_space
        or cfg.latent_space
        or engine.spec.base in ("lc-nointrusion", "saliency-cutmix")
        or engine.needs_pretrained_saliency
        or engine.needs_latent_model
    )
    resident = {}
    if use_resident:
        from pcgmix_tpu.data.device_cache import device_array

        put_corpus = device_array if cfg.device_cache else jnp.asarray
        resident = {
            "train_data": put_corpus(train_ds.data),
            "train_labels": put_corpus(train_ds.label),
        }
        if mesh is not None:
            # the corpus is tens of MB against 16 GB HBM: replicate it so
            # batch gathers by global index stay shard-local
            from pcgmix_tpu.parallel import replicate as _replicate

            resident = _replicate(resident, mesh)
    step_plain = make_train_step(
        model, tx, selc_es=selc_es, model_channels=model_channels, **resident
    )
    step_aug = (
        make_train_step(
            model, tx, selc_es=selc_es, engine=engine,
            model_channels=model_channels, **resident,
        )
        if engine.enabled
        else None
    )
    latent_steps: dict = {}  # depth → jitted step (latentmixup/manifold)
    eval_step = make_eval_step(model_eval)
    cand_loss_fn = make_forward_loss(model_eval)

    # multi-step scan path: K steps per dispatch, amortizing host↔device
    # round-trips; only for methods whose plans need no model-in-the-loop
    scan_k = cfg.steps_per_dispatch
    scan_mode = (
        scan_k > 1
        and use_resident
        and (
            not engine.enabled
            or (engine.spec.base != "latentmixup" and not engine.spec.manifold)
        )
    )
    multi_step = None
    if scan_mode:
        from pcgmix_tpu.train.steps import make_multi_step

        multi_step = make_multi_step(step_aug if engine.enabled else step_plain)

    if engine.needs_pretrained_saliency and saliency_model_provider is None:
        raise ValueError(
            f"method {cfg.method!r} needs a pretrained saliency model; pass "
            "saliency_model_provider (see pcgmix_tpu.saliency)"
        )

    from pcgmix_tpu import saliency as saliency_mod
    from pcgmix_tpu.train.counters import VariabilityCounter

    variability = VariabilityCounter(len(train_ds)) if cfg.track_variability else None
    # precompute the whole lr trajectory once (the schedule is a jnp
    # computation; evaluating it per step would pay a device round trip each)
    if cfg.use_sched:
        from pcgmix_tpu.train.schedule import onecycle_lr

        lr_table = np.asarray(
            jax.vmap(onecycle_lr(num_steps, cfg.lr_max))(jnp.arange(num_steps))
        )
    else:
        lr_table = np.full(num_steps, cfg.lr_max, np.float32)
    perf = PerformanceTracker()
    eval_staged = None  # lazily staged eval tensors, owned by this run
    epoch_plot = np.array(sorted(set(np.linspace(1, cfg.num_epochs, 11).astype(int))))
    base_key = jax.random.PRNGKey(cfg.seed_fix)
    step_count = 0
    start_epoch = 1
    times: list[float] = []
    lr_per_step: list[float] = []
    done = False

    ckpt_mgr = None
    if cfg.checkpoint_every and run_dir:
        from pcgmix_tpu.train.checkpoint import CheckpointManager

        ckpt_mgr = CheckpointManager(os.path.join(run_dir, "checkpoints"))
        if ckpt_mgr.latest_step() is not None:
            state, restored_step = ckpt_mgr.restore(state)
            step_count = restored_step
            start_epoch = step_count // steps_per_epoch + 1
            saved = ckpt_mgr.restore_metrics(restored_step)
            if saved:
                for k, v in saved.get("perf", {}).items():
                    perf.dict[k] = list(v)
                times = list(saved.get("times", []))
                lr_per_step = list(saved.get("lr_per_step", []))
            if step_count and _engine_rng_replayable(engine):
                # bring the fresh engine's cross-step RNG mirrors to where
                # the uninterrupted run's engine would be (exact resume for
                # the stream-consuming handlers; see replay_plan_rng)
                replay_plan_rng(engine, train_ds, cfg, step_count)
            if progress:
                print(f"resumed from checkpoint: step {step_count}, "
                      f"epoch {start_epoch}")

    for epoch in range(start_epoch, cfg.num_epochs + 1):
        # tracing/observability (SURVEY.md §5): profile one steady-state
        # epoch (epoch 2 — past compilation) when profile_dir is set
        if cfg.profile_dir and epoch == min(2, cfg.num_epochs):
            jax.profiler.start_trace(cfg.profile_dir)
        t0 = time.time()
        epoch_losses: list[float] = []
        epoch_preds: list[np.ndarray] = []
        epoch_targets: list[np.ndarray] = []
        it = EpochIterator(
            train_ds, cfg.batch_size, cfg.seed, step_count, cfg.loader_parity,
            materialize_data=not use_resident,
        )
        if scan_mode:
            buf_idx, buf_plans, buf_sids = [], [], []

            def flush_chunk():
                nonlocal state
                # stack each plan field on HOST and upload once per field —
                # stacking device-side would pay one transfer per small array
                stacked = (
                    jax.tree_util.tree_map(
                        lambda *xs: (
                            jnp.stack(xs)
                            if isinstance(xs[0], jax.Array)
                            else np.stack([np.asarray(x) for x in xs])
                        ),
                        *buf_plans,
                    )
                    if engine.enabled
                    else {}
                )
                state, outs = multi_step(
                    state, put_scan(np.stack(buf_idx)), put_scan(stacked),
                    jnp.asarray(buf_sids), epoch, base_key,
                )
                epoch_losses.append(outs["loss"])
                epoch_preds.append(outs["preds"].reshape(-1))
                epoch_targets.append(outs["target"].reshape(-1))
                buf_idx.clear()
                buf_plans.clear()
                buf_sids.clear()

            for batch in it:
                if engine.enabled:
                    arrays, plan = engine.plan_arrays_or_identity(
                        step_count, batch["frames"], batch["label"], batch["wav"]
                    )
                else:
                    arrays, plan = {}, None
                buf_idx.append(batch["indices"])
                buf_plans.append(arrays)
                buf_sids.append(step_count)
                if variability is not None:
                    variability.add(
                        batch["indices"],
                        plan.mix_indices if plan is not None else None,
                        plan.cut if plan is not None else None,
                        step_count,
                    )
                lr_per_step.append(float(lr_table[step_count]))
                step_count += 1
                if len(buf_idx) == scan_k:
                    flush_chunk()
                if step_count >= num_steps:
                    done = True
                    break
            # partial chunk: single-step dispatches (a different-K scan would
            # recompile)
            single = step_aug if engine.enabled else step_plain
            for idx, arrays, sid in zip(list(buf_idx), list(buf_plans), buf_sids):
                state, out = single(
                    state, put_batch({"indices": idx}),
                    put_batch(arrays) if engine.enabled else None, epoch,
                    jax.random.fold_in(base_key, sid),
                )
                epoch_losses.append(out["loss"])
                epoch_preds.append(out["preds"])
                epoch_targets.append(out["target"])
            buf_idx.clear()
        for batch in (it if not scan_mode else ()):
            if use_resident:
                dev_batch = put_batch({"indices": batch["indices"]})
            else:
                target_ohe = np.eye(cfg.num_classes, dtype=np.float32)[
                    batch["label"]
                ]
                dev_batch = put_batch({
                    "data": batch["data"],
                    "target_ohe": target_ohe,
                    "indices": batch["indices"],
                })
            rng = jax.random.fold_in(base_key, step_count)

            plan = None
            if engine.enabled:
                plan = engine.plan(
                    step_count,
                    batch["frames"],
                    batch["label"],
                    batch["wav"],
                    latent_fn=(
                        (lambda: latent_feature_fn(dev_batch["data"]))
                        if latent_feature_fn
                        else None
                    ),
                    saliency_fn=(
                        (
                            lambda mix_model: saliency_model_provider(mix_model)(
                                dev_batch["data"],
                                dev_batch["target_ohe"],
                                batch["frames"],
                            )
                        )
                        if saliency_model_provider
                        else None
                    ),
                    saliency_bins_fn=lambda: saliency_mod.training_saliency_bins(
                        model_eval,
                        state.params,
                        state.batch_stats,
                        dev_batch["data"],
                        dev_batch["target_ohe"],
                        batch["frames"],
                    ),
                )

            plan_dev = put_batch(plan.arrays) if (
                plan is not None and mesh is not None
            ) else (plan.arrays if plan is not None else None)
            if plan is None:
                state, out = step_plain(state, dev_batch, None, epoch, rng)
            elif engine.spec.base == "lc-nointrusion":
                cands, cand_t = engine.apply(
                    dev_batch["data"], dev_batch["target_ohe"], plan.arrays
                )
                losses = np.asarray(
                    cand_loss_fn(state.params, state.batch_stats, cands, cand_t)
                )
                sel = engine.lc_select(
                    losses, plan.aux["cand_labels"], plan.aux["n_per_class"]
                )
                # 'indices' must be GLOBAL dataset ids (the SELC table
                # scatters by them); idx1 holds batch-local candidate
                # positions, so map through the batch's own indices
                global_idx = np.asarray(batch["indices"])[
                    plan.arrays["idx1"][sel]
                ]
                sel_batch = {
                    "data": jnp.take(cands, jnp.asarray(sel), axis=0),
                    "target_ohe": jnp.take(cand_t, jnp.asarray(sel), axis=0),
                    "indices": jnp.asarray(global_idx),
                }
                if mesh is not None:
                    sel_batch = put_batch(sel_batch)
                state, out = step_plain(state, sel_batch, None, epoch, rng)
            elif plan.latent_depth is not None:
                d = plan.latent_depth
                if d not in latent_steps:
                    latent_steps[d] = make_train_step(
                        model,
                        tx,
                        selc_es=selc_es,
                        engine=engine,
                        latent_depth=d,
                        manifold=engine.spec.manifold,
                        model_eval=model_eval,
                        **resident,
                    )
                state, out = latent_steps[d](state, dev_batch, plan_dev, epoch, rng)
            else:
                state, out = step_aug(state, dev_batch, plan_dev, epoch, rng)

            # keep metrics as device arrays; pull once per epoch so the host
            # never blocks on the step (async dispatch pipelines plan
            # building with device compute)
            epoch_losses.append(out["loss"])
            epoch_preds.append(out["preds"])
            epoch_targets.append(out["target"])
            if variability is not None:
                variability.add(
                    batch["indices"],
                    plan.mix_indices if plan is not None else None,
                    plan.cut if plan is not None else None,
                    step_count,
                )
            if (cfg.latent_space and latent_space_model is not None) or (
                cfg.classical_space and not cfg.spectrogram
            ):
                # analysis dumps operate on the AUGMENTED batch
                # (train_model.py:508-532 runs after augment())
                if plan is not None and plan.latent_depth is None and (
                    engine.spec.base != "lc-nointrusion"
                ):
                    aug_data, _ = engine.apply(
                        dev_batch["data"], dev_batch["target_ohe"], plan.arrays
                    )
                else:
                    aug_data = dev_batch["data"]
                if cfg.classical_space and not cfg.spectrogram:
                    # features of the wide-band 5th channel, one CSV per step
                    # (train_model.py:519-532); the model consumes only the
                    # first 4 channels afterwards
                    import pandas as pd

                    from pcgmix_tpu.classical import feature_vector_seg

                    aug_np = np.asarray(aug_data)
                    rows = [
                        feature_vector_seg(
                            aug_np[i, 4], int(batch["label"][i]),
                            batch["frames"][i], batch["wav"][i],
                            int(batch["sig_qual"][i]), i, "train",
                        )
                        for i in range(len(batch["label"]))
                    ]
                    cs_dir = utils.check_folder(
                        os.path.join(
                            run_dir or cfg.experiments_root, "classical_space"
                        )
                    )
                    pd.DataFrame(rows).reset_index(drop=True).to_csv(
                        os.path.join(cs_dir, f"train_{step_count}.csv"), index=False
                    )
                    dev_batch["data"] = dev_batch["data"][:, :4, :]
                    aug_data = aug_data[:, :4, :]
                if cfg.latent_space and latent_space_model is not None:
                    # out-of-manifold-intrusion dumps (train_model.py:508-518)
                    from pcgmix_tpu.latent import save_latent_space

                    fts = latent_space_model.generate(aug_data)
                    save_latent_space(
                        {"fts": fts, "target": batch["label"]},
                        "train",
                        step_count,
                        run_dir or cfg.experiments_root,
                    )
            lr_per_step.append(float(lr_table[step_count]))
            step_count += 1
            if step_count >= num_steps:
                done = True
                break

        # Sync only at plot epochs (each sync pays a full round trip on
        # remote devices).  The cumulative `times` consumed at plot epochs
        # stays exact: the block there absorbs any queued work from the
        # un-synced epochs before it.
        if epoch in epoch_plot and epoch_losses:
            jax.block_until_ready(epoch_losses[-1])
        times.append(time.time() - t0)
        if cfg.profile_dir and epoch == min(2, cfg.num_epochs):
            jax.profiler.stop_trace()
        if epoch in epoch_plot:
            perf.add("epochs", epoch)
            perf.add("steps", step_count)
            # ONE device→host transfer for the whole epoch's metrics —
            # per-array pulls each pay a full round trip on remote devices
            losses_h, preds_h, targets_h = jax.device_get(
                (epoch_losses, epoch_preds, epoch_targets)
            )
            losses_np = np.concatenate([np.atleast_1d(l) for l in losses_h])
            perf.add("train_loss", float(losses_np.mean()))
            perf.add(
                "train_accuracy",
                segment_accuracy(
                    np.concatenate([np.ravel(p) for p in preds_h]),
                    np.concatenate([np.ravel(t) for t in targets_h]),
                ),
            )
            if eval_staged is None:
                if mesh is not None:
                    eval_put = put_batch
                elif cfg.device_cache:
                    from pcgmix_tpu.data.device_cache import device_array

                    eval_put = device_array
                else:
                    eval_put = None
                eval_staged = stage_eval(
                    test_ds, cfg.eval_batch_size, cfg.num_classes,
                    device_put=eval_put,
                )
            evaluate(cfg, eval_step, state, test_ds, perf,
                     engine.spec.class_majority, staged=eval_staged)
            perf.add("times", float(np.sum(times)))
            if progress:
                print(
                    f"epoch {epoch}: train_acc={perf.dict['train_accuracy'][-1]:.2f} "
                    f"test_acc={perf.dict['test_accuracy'][-1]:.2f}"
                )
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
                    plotters.plot_lr_per_step(lr_per_step, run_dir)
                    plotters.plot_times(
                        times, list(range(1, len(times) + 1)), run_dir
                    )
                    if variability is not None and variability.steps:
                        plotters.plot_variability(variability, run_dir)
        if ckpt_mgr is not None and epoch % cfg.checkpoint_every == 0:
            ckpt_mgr.save(
                step_count, state,
                metrics={"perf": perf.dict, "times": times,
                         "lr_per_step": lr_per_step},
            )
        if done:
            break

    if ckpt_mgr is not None:
        ckpt_mgr.close()
    if run_dir:
        save_checkpoint(os.path.join(run_dir, "model.msgpack"), state)
    perf.dict["lr_per_step"] = lr_per_step
    return perf.dict


def stage_eval(test_ds, eval_batch_size, num_classes, device_put=None):
    """Upload the eval split once: list of (data_dev, target_dev, host_batch).

    The staged list is owned by the caller (train_model keeps it for the
    run's lifetime); with the default content-addressed device_put
    (data/device_cache.device_array) the underlying buffers additionally
    persist in the process-level LRU so the next grid member's eval
    staging is transfer-free.  Different eval_batch_size/num_classes slice
    different byte ranges and therefore hash to different cache keys —
    stale-buffer reuse is impossible by construction.
    """
    put = device_put or jnp.asarray
    return [
        (put(b["data"]),
         put(np.eye(num_classes, dtype=np.float32)[b["label"]]),
         b)
        for b in eval_batches(test_ds, eval_batch_size)
    ]


def replay_plan_rng(engine, train_ds, cfg, num_past_steps: int) -> None:
    """Advance a fresh AugmentEngine's stateful RNG mirrors (np_stream /
    noise key) to the state an uninterrupted run would have after
    ``num_past_steps`` training steps, by rebuilding those steps' plans
    host-side (~1 ms/step) without dispatching any compute.

    Needed on checkpoint resume: handlers like magnitudewarp/timewarp/
    gaussiannoise draw from the per-run mirror stream that ADVANCES across
    steps (engine.py np_stream), so a resumed run with a fresh engine would
    otherwise build different post-resume plans than the uninterrupted run.
    Only valid for engines whose plans need no model in the loop —
    model-hook methods' RNG trajectories depend on past model states, which
    a checkpoint cannot reproduce (disclosed in PARITY.md)."""
    step = 0
    while step < num_past_steps:
        it = EpochIterator(
            train_ds, cfg.batch_size, cfg.seed, step, cfg.loader_parity,
            materialize_data=False,
        )
        advanced = False
        for batch in it:
            engine.plan(step, batch["frames"], batch["label"], batch["wav"])
            step += 1
            advanced = True
            if step >= num_past_steps:
                break
        if not advanced:  # split smaller than one batch — cannot happen in
            break         # a run that took steps, but never loop forever


def _engine_rng_replayable(engine) -> bool:
    """Plans rebuildable without model hooks (see replay_plan_rng)."""
    return engine.enabled and not (
        engine.needs_pretrained_saliency
        or engine.needs_latent_model
        or engine.spec.base in ("lc-nointrusion", "saliency-cutmix")
    )


def aggregate_recording_eval(device_out, staged, class_majority=False):
    """Host aggregation of eval-step outputs → (test_loss, metrics dict).

    ``device_out`` — one (probs, losses) host pair per staged batch, padded
    rows masked out via the staged batch's validity mask.  Shared by
    :func:`evaluate` and the gang trainer's vmapped eval (train/gang.py) so
    the recording-level aggregation cannot drift between the two paths
    (test_data_accuracy, train_model.py:591-670)."""
    probs_all, loss_sum, labels, wavs, n = [], 0.0, [], [], 0
    for (probs, losses), (_, _, batch) in zip(device_out, staged):
        mask = batch["mask"]
        probs_all.append(probs[mask])
        loss_sum += float(losses[mask].sum())
        labels.append(batch["label"][mask])
        wavs.append(batch["wav"][mask])
        n += int(mask.sum())
    metrics = recording_level_eval(
        np.concatenate(probs_all), np.concatenate(labels),
        np.concatenate(wavs), class_majority,
    )
    return loss_sum / max(n, 1), metrics


def evaluate(cfg, eval_step, state, test_ds, perf, class_majority=False,
             staged=None):
    """Recording-level test pass (test_data_accuracy, train_model.py:591-670).

    ``staged`` — pre-uploaded eval tensors from :func:`stage_eval`; the
    reference re-uploads the split every plot epoch."""
    if staged is None:
        staged = stage_eval(test_ds, cfg.eval_batch_size, cfg.num_classes)
    device_out = [
        eval_step(state.params, state.batch_stats, data_dev, target_dev)
        for data_dev, target_dev, _ in staged
    ]
    device_out = jax.device_get(device_out)  # one transfer for all batches
    test_loss, metrics = aggregate_recording_eval(
        device_out, staged, class_majority
    )
    perf.add("test_loss", test_loss)
    for k, v in metrics.items():
        perf.add(k, v)


def save_checkpoint(path: str, state: TrainState) -> None:
    """Final weights (train_model.py:481-482 analogue): params + batch_stats
    as flax msgpack."""
    from flax import serialization

    payload = {"params": state.params, "batch_stats": state.batch_stats}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))


def load_checkpoint(path: str, model, sample_shape) -> dict:
    """Restore {'params', 'batch_stats'} for a model by shape inference.

    The template comes from ``jax.eval_shape`` over ``model.init`` — zero
    compute and zero device memory, but the full variable-tree STRUCTURE, so
    a checkpoint from a different model preset fails here with a clear
    structure mismatch instead of deep inside a later jitted apply.  Use
    ``models.registry.sample_input_shape`` to derive ``sample_shape`` from a
    config (2-D datasets size by the dataset name, not ``sig_len``)."""
    from flax import serialization

    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros(sample_shape, jnp.float32)
        )
    )
    template = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())
