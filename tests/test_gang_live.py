"""LIVE-model gang training (lc-nointrusion / saliency-cutmix) — parity vs
single runs.

These methods read the CURRENT training model every step (candidate-pool
loss scoring, augmentations.py:1264-1277; in-training saliency bins,
augmentations.py:1396-1470).  Inside a gang the live model is the stacked
member state itself: one vmapped scoring/saliency dispatch per step feeds
per-member host planning (the standalone host code verbatim), then the
vmapped update (train/gang.py live_mode).  Each member must reproduce its
standalone train_model run up to vmap-batched float reassociation — with
the extra wrinkle that lc-nointrusion's SELECTION is discrete: a rounding
flip near a candidate-loss tie changes which candidates train.  The SGD
configs keep trajectories tight enough that selections match in practice.
"""

import numpy as np
import pytest

from tests.test_gang import (  # noqa: F401  (fixtures re-exported by name)
    _assert_member_parity, _cfg, _members, seed_datas, tiny_dataset,
)

from pcgmix_tpu.train import train_gang, train_model


def test_gang_lc_nointrusion_sgd_parity(tiny_dataset, seed_datas):
    """lc-nointrusion gang vs singles: the vmapped score→select→train
    sequence must reproduce each standalone run (which scores with
    make_forward_loss on the engine-applied pool, selects via
    engine.lc_select, and trains step_plain on the survivors)."""
    cfgs = _members(seed_datas[:2], method="lc-nointrusion",
                    op="SGD", use_sched=False, num_epochs=2)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles, loss_rtol=1e-3, loss_atol=1e-5)


def test_gang_lc_nointrusion_selc_adam(tiny_dataset, seed_datas):
    """lc-nointrusionSELC + Adam: the SELC table must scatter by the
    SELECTED candidates' source rows (global split-local ids) exactly as
    train_model's lc branch does; Adam amplifies rounding, so tolerances
    follow the measured gang-vs-single envelope (test_gang.py)."""
    cfgs = _members(seed_datas[:2], method="lc-nointrusionSELC",
                    num_epochs=3)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles, loss_rtol=8e-2, loss_atol=1e-2)


def test_gang_saliency_cutmix_sgd_parity(tiny_dataset, seed_datas):
    """saliency-cutmix gang vs singles: every member's bins must come from
    ITS OWN current params (one vmapped saliency dispatch), and the binned
    plan must splice identically to the standalone run."""
    cfgs = _members(seed_datas[:2], method="saliency-cutmix",
                    op="SGD", use_sched=False, num_epochs=2)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles, loss_rtol=1e-3, loss_atol=1e-5)


def test_gang_live_prob_gate(tiny_dataset, seed_datas):
    """'+p' gating: the gate draw is step-seeded (member-uniform), so
    gated-off steps dispatch the plain vmapped step — and the gated mix of
    plain/live steps still matches the standalone runs."""
    cfgs = _members(seed_datas[:2], method="saliency-cutmix+0.5",
                    op="SGD", use_sched=False, num_epochs=2)
    gang = train_gang(cfgs, tiny_dataset)
    singles = [train_model(c, tiny_dataset) for c in cfgs]
    _assert_member_parity(gang, singles, loss_rtol=1e-3, loss_atol=1e-5)


def test_gang_live_mesh_matches_single_device(tiny_dataset, seed_datas):
    """Live-model gang with the member axis sharded over a 2-device mesh:
    the vmapped scoring dispatch and the update both ride GSPMD sharding
    propagation and must match the unsharded gang."""
    cfgs = _members(seed_datas[:2], method="lc-nointrusion",
                    op="SGD", use_sched=False, num_epochs=2)
    plain = train_gang(cfgs, tiny_dataset)
    meshed = train_gang(cfgs, tiny_dataset, n_devices=2)
    _assert_member_parity(meshed, plain, loss_rtol=1e-3, loss_atol=1e-5)


def test_gang_live_ragged_raises(tiny_dataset):
    """Unequal member split sizes route to the ragged path, which does not
    support live methods (diverging per-member gates) — clear error, the
    runner's sequential fallback catches it."""
    from pcgmix_tpu.train.loop import build_splits

    sizes = {}
    for i in range(1, 17):
        c = _cfg(seed_data=1100000 + i, method="lc-nointrusion")
        tr, _ = build_splits(c, tiny_dataset)
        sizes.setdefault(len(tr), c.seed_data)
        if len(sizes) >= 2:
            break
    assert len(sizes) >= 2, "probe found no unequal subset sizes"
    cfgs = [_cfg(seed_data=sd, method="lc-nointrusion")
            for sd in sizes.values()]
    with pytest.raises(ValueError, match="equal-size"):
        train_gang(cfgs, tiny_dataset)
