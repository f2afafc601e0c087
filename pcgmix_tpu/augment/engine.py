"""Augmentation engine: per-step host plans + one jitted device apply.

Execution model (vs. the reference's per-sample GPU loop,
augmentations.py:970-977):

- ``plan(step, frames, labels, wavs, …)`` runs on host in O(batch) scalar
  work.  It reproduces the reference's step-seeded RNG protocol bit-exactly
  (SURVEY.md §2.5) and emits a Plan whose ``arrays`` are a few KB of int32/
  float32 — pair indices, per-segment piece windows, λ, spline knots, mask
  bounds.  Returns None when the batch is left unaugmented (the ``+p``
  apply-probability gate, augmentations.py:932-939).
- ``apply(data, target_ohe, arrays)`` is a pure, statically-shaped function
  of device arrays, safe to close over inside a jitted train step.  All
  tensor surgery happens here: vmapped piecewise mixes, matmul spline
  warps, vectorized masks.

Model-in-the-loop methods (salopt, closestknn/bins, saliency-cutmix,
latentmixup, manifold-*, lc-nointrusion) receive the model through injected
callables / the trainer, keeping this module model-agnostic.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pcgmix_tpu import rng as prng
from pcgmix_tpu.augment import pairing as pairing_mod
from pcgmix_tpu.augment.methods import MethodSpec, parse_method
from pcgmix_tpu.augment.salopt import salopt_displacements
from pcgmix_tpu.models.registry import max_latent_depth
from pcgmix_tpu.ops.masks import interval_mask, zero_after
from pcgmix_tpu.ops.piecewise import (
    piecewise_mix,
    segment_blend_pieces,
)
from pcgmix_tpu.ops.spline import magnitude_warp, time_warp


@dataclasses.dataclass
class AugmentConfig:
    method: str
    batch_size: int
    num_channels: int
    sig_len: int  # time axis (spectrogram: width)
    num_classes: int = 2
    sample_rate: int = 1000
    spectrogram: bool = False
    spec_freq: int = 0  # frequency axis for spectrograms
    model: str = "resnet9"
    cvd_map: Optional[dict] = None
    use_pallas: bool = False  # TPU fast path: VMEM lane-rotation kernel for
                              # the piecewise mixes (~3x over the XLA gather)
    mesh: Optional[object] = None  # DP mesh (jax.sharding.Mesh).  When set,
                              # Pallas calls route through shard_map with the
                              # pair gather done by XLA first (GSPMD inserts
                              # the cross-shard collective; the opaque
                              # pallas_call only ever sees shard-local rows)
    pallas_interpret: bool = False  # run kernels in interpret mode (CPU CI)


@dataclasses.dataclass
class Plan:
    arrays: dict
    mix_indices: Optional[np.ndarray] = None
    frames_new: Optional[np.ndarray] = None
    latent_depth: Optional[int] = None
    cut: Optional[int] = None
    aux: dict = dataclasses.field(default_factory=dict)


def frames_end(frames: np.ndarray) -> np.ndarray:
    """Last valid segment boundary per row.  Equals frames[:, -1] for the
    zero-pad variant; for the full multi-cycle variant (frames padded to 28
    with −1, databuilder.ipynb cell 23) it is the last non-padding entry
    (boundaries are monotone, padding is −1, so the row max)."""
    return np.asarray(frames).max(axis=-1)


def _sanitize_padded_pieces(pieces: dict) -> None:
    """Full-variant hygiene: −1-padded frames produce negative/garbage piece
    geometry in the padding slots; force them to empty pieces at offset 0 so
    every backend (XLA masks AND the Pallas lane-rotation kernel) sees
    well-formed inputs."""
    length = np.asarray(pieces["length"])
    bad = length <= 0
    length = np.where(bad, 0, length)
    pieces["length"] = length
    pieces["dst_start"] = np.where(bad, 0, np.asarray(pieces["dst_start"]))
    pieces["src_start"] = np.where(bad, 0, np.asarray(pieces["src_start"]))


def _blend(data, mix_idx, lam):
    """Whole-signal mixup: data·λ + data[mix]·(1−λ) (augmentations.py:849)."""
    mixed = jnp.take(data, jnp.asarray(mix_idx, jnp.int32), axis=0)
    lam = jnp.asarray(lam, data.dtype)
    return data * lam + mixed * (1.0 - lam)


def _blend_targets(target_ohe, mix_idx, lam_t):
    mixed = jnp.take(target_ohe, jnp.asarray(mix_idx, jnp.int32), axis=0)
    lam_t = jnp.asarray(lam_t, target_ohe.dtype)
    if lam_t.ndim == 0:
        lam_t = lam_t[None]
    if lam_t.ndim == 1:
        lam_t = lam_t[:, None]
    return target_ohe * lam_t + mixed * (1.0 - lam_t)


def _vmapped_pieces(data, d2, a):
    return jax.vmap(lambda x1, x2, ds, ss, ln, sl, al: piecewise_mix(
        x1, x2, ds, ss, ln, sl, al, base_is_d1=True
    ))(data, d2, a["dst"], a["src"], a["len"], a["sel"], a["alpha"])


def _concat_pieces_apply(data, a, *, smooth: bool, base_rows=None):
    """Concat-style (base zeros) piecewise apply, optional sigmoid crossfade.

    arrays: idx1, idx2 (N,), dst/src/len/sel/alpha (N, K); for smooth:
    c1, c2, ov (N,).  Crossfade (augmentations.py:41-51): out[c1-ov:c1+ov] =
    d1·(1−σ) + d2[t−c1+c2]·σ with σ a [-8, 8] logistic ramp whose endpoints
    are forced to 0/1.
    """
    idx1 = a["idx1"].astype(jnp.int32)
    idx2 = a["idx2"].astype(jnp.int32)
    d1 = jnp.take(data, idx1, axis=0) if base_rows is None else base_rows
    d2 = jnp.take(data, idx2, axis=0)
    out = jax.vmap(lambda x1, x2, ds, ss, ln, sl, al: piecewise_mix(
        x1, x2, ds, ss, ln, sl, al, base_is_d1=False
    ))(d1, d2, a["dst"], a["src"], a["len"], a["sel"], a["alpha"])
    if smooth:
        T = data.shape[-1]
        t = jnp.arange(T, dtype=jnp.int32)

        def fade(o, x1, x2, c1, c2, ov):
            j = (t - (c1 - ov)).astype(jnp.float32)
            denom = jnp.maximum(2 * ov - 1, 1).astype(jnp.float32)
            xlin = -8.0 + 16.0 * j / denom
            w2 = jax.nn.sigmoid(xlin)
            w2 = jnp.where(j <= 0, 0.0, w2)
            w2 = jnp.where(j >= 2 * ov - 1, 1.0, w2)
            inwin = (t >= c1 - ov) & (t < c1 + ov) & (ov > 0)
            g2 = jnp.take(x2, jnp.clip(t - c1 + c2, 0, T - 1), axis=-1)
            blended = x1 * (1.0 - w2) + g2 * w2
            return jnp.where(inwin, blended, o)

        out = jax.vmap(fade)(out, d1, d2, a["c1"], a["c2"], a["ov"])
    return out


def _mask_bb(data, bb):
    """Zero data[..., bb0:bb1) per sample; bb: (B, 2) (or (B, C, 2) for the
    per-channel variant when data is (B, C, T))."""
    T = data.shape[-1]
    if bb.ndim == 2:
        m = interval_mask(T, bb[:, 0], bb[:, 1])  # (B, T)
        m = m.reshape(m.shape[0], *([1] * (data.ndim - 2)), T)
    else:
        m = interval_mask(T, bb[..., 0], bb[..., 1])  # (B, C, T)
    return jnp.where(m.astype(bool), jnp.zeros((), data.dtype), data)


class AugmentEngine:
    """One engine per (method, dataset geometry).  See module docstring."""

    def __init__(self, cfg: AugmentConfig):
        self.cfg = cfg
        self.spec: MethodSpec = parse_method(cfg.method, spectrogram=cfg.spectrogram)
        # Mirror of the ambient NumPy stream: seeded once per run with
        # seed_fix=4 (train_model.py:222), consumed by the handlers that draw
        # from the global stream without reseeding (timewarp/magnitudewarp),
        # reset by every get_lambda (np.random.seed(step)).  gaussiannoise
        # draws its SNR here too, but that one is DISTRIBUTIONAL only — the
        # reference's audiomentations draws from the stdlib random stream
        # (see PARITY.md).
        self.np_stream = np.random.RandomState(4)
        self._noise_key = jax.random.PRNGKey(4)

    # ------------------------------------------------------------------ #
    # capability flags the trainer uses to wire model callbacks
    # ------------------------------------------------------------------ #
    @property
    def enabled(self) -> bool:
        return self.spec.enabled

    @property
    def needs_pretrained_saliency(self) -> bool:
        return self.spec.salopt is not None

    @property
    def needs_latent_model(self) -> bool:
        return self.spec.pairing in ("closestknn", "closestbins")

    @property
    def needs_training_model(self) -> bool:
        return self.spec.base in ("saliency-cutmix", "lc-nointrusion") or (
            self.spec.base in ("latentmixup",) or self.spec.manifold
        )

    # ------------------------------------------------------------------ #
    # host: plan
    # ------------------------------------------------------------------ #
    def plan(
        self,
        step: int,
        frames: np.ndarray,
        labels: np.ndarray,
        wavs: Optional[Sequence[str]] = None,
        *,
        latent_fn: Optional[Callable] = None,
        saliency_fn: Optional[Callable] = None,
        saliency_bins_fn: Optional[Callable] = None,
        _force: bool = False,
    ) -> Optional[Plan]:
        spec, cfg = self.spec, self.cfg
        if not spec.enabled:
            return None
        if not _force and spec.prob < 1.0 and prng.py_uniform(step) >= spec.prob:
            return None
        base = spec.base
        frames = np.asarray(frames, np.int64)
        labels = np.asarray(labels)
        B = len(labels)
        if frames.shape[1] != 5 and base in (
            "labelcutmix", "lengthcutmix", "datasetcutmix", "wavcutmix",
            "cutmix", "lc-nointrusion", "saliency-cutmix", "swapsysdia",
            "cont-cutmix",
        ):
            # concat-style methods rewrite the frames vector; with −1-padded
            # multi-cycle frames (full variant) that contract is undefined in
            # the reference too — use the zero-pad variant for these
            raise NotImplementedError(
                f"{base!r} supports single-cycle (5-entry) frames only; "
                "the full multi-cycle variant supports the keep-duration "
                "families, masks, warps, and whole-signal mixes"
            )

        def pair():
            mix, dist = pairing_mod.build_pairing(
                spec, step, labels, frames, wavs, cfg.batch_size,
                cvd_map=cfg.cvd_map, latent_fn=latent_fn,
            )
            return mix, dist

        if base in (
            "durratiomixup",
            "durmixmagwarp",
            "durmixrespscale",
            "durmixfreqmask",
            "durmixtimemask",
            "durmixcutout",
        ):
            return self._plan_keepdur_blend(step, frames, labels, pair, saliency_fn)
        if base in ("durratiocutmix", "(UMC-subset)durratiocutmix", "wav-durratiocutmix"):
            return self._plan_keepdur_cut(step, frames, pair)
        if base == "mixup":
            mix, _ = pair()
            lam = prng.np_beta_lambda(1.0, step)
            return Plan(
                arrays={"mix": mix, "lam": np.float32(lam)},
                mix_indices=mix,
            )
        if base == "latentmixup":
            mix = pairing_mod.same_label(labels, step)
            lam = prng.np_beta_lambda(1.0, step)
            depth = self._latent_depth(step)
            return Plan(
                arrays={"mix": mix, "lam": np.float32(lam)},
                mix_indices=mix,
                latent_depth=depth,
            )
        if base == "timemask" and not cfg.spectrogram:
            f1, f2 = prng.py_masked_region(step, spec.params[0])
            end = frames_end(frames)
            bb = np.stack(
                [(f1 * end).astype(np.int64),
                 (f2 * end).astype(np.int64)], axis=1
            )
            return Plan(arrays={"bb": bb})
        if base == "respiratoryscale":
            u = prng.py_uniform(step)
            rmin, rmax = spec.params
            return Plan(arrays=self._resp_arrays(u, rmin, rmax))
        if base in ("magnitudewarp", "timewarp"):
            sigma, knot = spec.params[0], int(spec.params[1])
            knots = prng.np_magwarp_knots_unseeded(
                self.np_stream, B, knot, cfg.num_channels, sigma
            )
            return Plan(arrays={"knots": knots})
        if base == "gaussiannoise":
            smin, smax = spec.params
            snr = self.np_stream.uniform(smin, smax, size=(B,)).astype(np.float32)
            self._noise_key, sub = jax.random.split(self._noise_key)
            # zero-after only applies to the zero-pad variant's tail contract
            # (augmentations.py:1076); full multi-cycle windows carry real
            # signal to sig_len, which must not be erased
            end = (
                frames_end(frames) if frames.shape[1] == 5
                else np.full(B, cfg.sig_len, np.int64)
            )
            return Plan(arrays={"snr": snr, "key": jax.random.fold_in(sub, step),
                                "end": end})
        if base in ("labelcutmix", "lengthcutmix", "datasetcutmix", "wavcutmix",
                    "cutmix"):
            if base == "cutmix" and spec.per_channel:
                p = self._plan_concat_per_channel(step, frames, pair)
            else:
                p = self._plan_concat(step, frames, labels, pair)
            if spec.manifold:
                p.latent_depth = prng.py_randint(step, 0, 3)  # augmentations.py:1527-1530
            return p
        if base == "lc-nointrusion":
            return self._plan_lc_nointrusion(step, frames, labels)
        if base == "swapsysdia":
            return self._plan_swapsysdia(step, frames)
        if base == "cont-cutmix":
            return self._plan_cont_cutmix(step, frames)
        if base == "saliency-cutmix":
            return self._plan_saliency_cutmix(step, frames, labels, saliency_bins_fn)
        if base == "cutout" and not cfg.spectrogram:
            return self._plan_cutout_1d(step, frames)
        if base == "s1s2mask":
            bb1 = frames[:, 0:2]
            bb2 = frames[:, 2:4]
            return Plan(arrays={"bb1": bb1, "bb2": bb2})
        # --- 2-D-only leaves ---
        if base in ("cutout", "timemask", "freqmask") and cfg.spectrogram:
            return Plan(arrays=self._mask_arrays_2d(step, frames))
        raise NotImplementedError(f"plan for method base {base!r}")

    # ---------------- keep-duration families ---------------- #

    def _plan_keepdur_blend(self, step, frames, labels, pair, saliency_fn):
        spec, cfg = self.spec, self.cfg
        mix, dist = pair()
        alpha = spec.alpha
        if spec.base == "durmixrespscale":
            alpha = 1.0
        knots = None
        if spec.base == "durmixmagwarp":
            sigma, knot = spec.params[0], int(spec.params[1])
            lam, knots = prng.np_lambda_then_magwarp_knots(
                alpha, step, len(labels), knot, cfg.num_channels, sigma
            )
        else:
            lam = prng.np_beta_lambda(alpha, step)
        nseg = frames.shape[1] - 1  # 4 (zero-pad variant) or 27 (full, −1 pad)
        disp = np.zeros((len(labels), nseg), np.int64)
        if spec.salopt is not None:
            if nseg != 4:
                raise NotImplementedError(
                    "(salopt…) displacement assumes single-cycle frames; "
                    "use the zero-pad dataset variant"
                )
            sal = saliency_fn(mix_model=spec.salopt_model)
            disp = salopt_displacements(sal, frames, mix, lam, spec.salopt)
        elif spec.rand and not cfg.spectrogram:
            disp = self._rand_displacements(step, frames, mix, segs=range(nseg))
        lam_seg = np.full((len(labels), nseg), lam, np.float32)
        pieces = segment_blend_pieces(frames, frames[mix], disp, lam_seg)
        if nseg > 4:
            _sanitize_padded_pieces(pieces)
        arrays = {
            "mix": mix,
            "dst": pieces["dst_start"],
            "src": pieces["src_start"],
            "len": pieces["length"],
            "sel": pieces["src_sel"],
            "alpha": pieces["alpha"],
            "lam": np.float32(lam),
        }
        if knots is not None:
            arrays["knots"] = knots
        if spec.base == "durmixrespscale":
            u = prng.py_uniform(step)
            rmin, rmax = spec.params
            arrays.update(self._resp_arrays(u, rmin, rmax))
        if spec.base in ("durmixfreqmask", "durmixtimemask", "durmixcutout"):
            arrays.update(self._mask_arrays_2d(step, frames))
        return Plan(arrays=arrays, mix_indices=mix, aux={"total_distance": dist})

    def _plan_keepdur_cut(self, step, frames, pair):
        spec = self.spec
        mix, dist = pair()
        B = frames.shape[0]
        nseg = frames.shape[1] - 1
        # swap systole/diastole = segment indices ≡ 1, 3 (mod 4) — per cycle
        # in the full multi-cycle variant
        swap_segs = tuple(k for k in range(nseg) if k % 4 in (1, 3))
        disp = np.zeros((B, nseg), np.int64)
        if spec.rand and not self.cfg.spectrogram:
            disp = self._rand_displacements(step, frames, mix, segs=swap_segs)
        pieces = segment_blend_pieces(
            frames, frames[mix], disp, np.zeros((B, nseg), np.float32)
        )
        if nseg > 4:
            _sanitize_padded_pieces(pieces)
        length = np.asarray(pieces["length"]).copy()
        for k in range(nseg):  # S1/S2 untouched (augmentations.py:340-366)
            if k % 4 in (0, 2):
                length[:, k] = 0
        arrays = {
            "mix": mix,
            "dst": pieces["dst_start"],
            "src": pieces["src_start"],
            "len": length,
            "sel": pieces["src_sel"],
            "alpha": pieces["alpha"],
        }
        return Plan(arrays=arrays, mix_indices=mix, aux={"total_distance": dist})

    def _rand_displacements(self, step, frames, mix, segs):
        """(rand) displacement draws: randint(0, |gap|) from a fresh
        Random(step) per segment (augmentations.py:305-338, :349-365).
        Segments invalidated by −1 padding (full multi-cycle variant) draw
        nothing — their pieces are disabled anyway."""
        B = frames.shape[0]
        nseg = frames.shape[1] - 1
        disp = np.zeros((B, nseg), np.int64)
        len1 = frames[:, 1:] - frames[:, :-1]
        len2 = frames[mix][:, 1:] - frames[mix][:, :-1]
        gap = np.abs(len2 - len1)
        valid = (len1 > 0) & (len2 > 0) & (frames[:, :-1] >= 0)
        for i in range(B):
            for k in segs:
                if valid[i, k]:
                    disp[i, k] = prng.py_randint(step, 0, int(gap[i, k]))
        return disp

    # ---------------- concat family ---------------- #

    def _cut_choice(self, step):
        """Cut-point seed differs per handler: labelcutmix/lc-nointrusion/
        2-D cutmix use Random(step·131071) when '(rand)'
        (augmentations.py:1304,:1248, augmentations2d.py:588-590);
        length/dataset/wav-cutmix use Random(step) when '(rand)'
        (augmentations.py:1139,:1170,:1201); the 1-D plain cutmix handler
        ALWAYS draws Random(step·131071).randint(1,3) — no '(rand)' gate
        (augmentations.py:1549)."""
        spec = self.spec
        if spec.base == "cutmix" and not self.cfg.spectrogram:
            return prng.py_randint(step * 131071, 1, 3)
        if not spec.rand:
            return 2
        if spec.base in ("labelcutmix", "lc-nointrusion") or (
            self.cfg.spectrogram and spec.base == "cutmix"
        ):
            return prng.py_randint(step * 131071, 1, 3)
        return prng.py_randint(step, 1, 3)

    def _concat_piece_arrays(self, frames, mix_or_idx2, cut, idx1=None):
        """Host piece math for cutmix_multidim_tensors (augmentations.py:30-58)."""
        T = self.cfg.sig_len
        f1 = frames if idx1 is None else frames[idx1]
        f2 = frames[mix_or_idx2]
        N = f1.shape[0]
        c1 = f1[:, cut]
        c2 = f2[:, cut]
        last = np.minimum(c1 + f2[:, -1] - c2, T)
        dst = np.stack([np.zeros(N, np.int64), c1], axis=1)
        src = np.stack([np.zeros(N, np.int64), c2], axis=1)
        ln = np.stack([c1, last - c1], axis=1)
        sel = np.stack([np.zeros(N, np.int64), np.ones(N, np.int64)], axis=1)
        alpha = np.zeros((N, 2), np.float32)
        # new frames vector (augmentations.py:52-57)
        f_new = np.concatenate(
            [f1[:, : cut + 1], f2[:, cut + 1 :] - c2[:, None] + c1[:, None]], axis=1
        )
        f_new[:, -1] = np.minimum(f_new[:, -1], last)
        arrays = {"dst": dst, "src": src, "len": ln, "sel": sel, "alpha": alpha,
                  "last": last, "c1": c1, "c2": c2}
        return arrays, f_new

    def _plan_concat(self, step, frames, labels, pair):
        spec = self.spec
        mix, dist = pair()
        cut = self._cut_choice(step)
        arrays, f_new = self._concat_piece_arrays(frames, mix, cut)
        arrays["idx1"] = np.arange(len(labels), dtype=np.int64)
        arrays["idx2"] = mix
        if spec.smooth:
            d1_cut_len = frames[:, cut]
            d2_cut_len = frames[mix][:, -1] - frames[mix][:, cut]
            ov = np.minimum.reduce([
                np.full_like(d1_cut_len, 10),
                d1_cut_len,
                d2_cut_len,
                frames[:, -1] - frames[:, cut],
                frames[mix][:, cut],
            ])
            arrays["ov"] = ov
        plan = Plan(arrays=arrays, mix_indices=mix, frames_new=f_new, cut=cut,
                    aux={"total_distance": dist})
        if "cutout" in spec.raw:
            lo, hi = prng.py_sorted_uniform_pair(step)
            bb = np.stack(
                [(lo * f_new[:, -1]).astype(np.int64),
                 (hi * f_new[:, -1]).astype(np.int64)], axis=1
            )
            arrays["bb"] = bb
        if spec.base == "cutmix" and not self.cfg.spectrogram:
            # per-sample λ = f1[cut]/last blends targets (augmentations.py:1560-1565)
            lam_t = (frames[:, cut] / np.maximum(arrays["last"], 1)).astype(np.float32)
            arrays["lam_t"] = lam_t
        return plan

    def _plan_concat_per_channel(self, step, frames, pair):
        """cutmix(ch): per-channel cut points Random(step·131071 + c·524287)
        (augmentations.py:1536-1547); each channel splices the partner's tail
        in place and zeroes beyond the joined length; λ averages the
        per-channel f1[cut]/last ratios."""
        mix, dist = pair()
        T = self.cfg.sig_len
        C = self.cfg.num_channels
        cuts = [
            prng.py_randint(step * 131071 + c * 524287, 1, 3) for c in range(C)
        ]
        f1, f2 = frames, frames[mix]
        c1 = f1[:, cuts]  # (B, C)
        c2 = f2[:, cuts]
        last = np.minimum(c1 + f2[:, -1:] - c2, T)
        lam_t = (c1 / np.maximum(last, 1)).mean(axis=1).astype(np.float32)
        arrays = {"idx2": mix, "ch_c1": c1, "ch_c2": c2, "ch_last": last,
                  "lam_t": lam_t}
        return Plan(arrays=arrays, mix_indices=mix)

    def _apply_concat_per_channel(self, data, target_ohe, arrays):
        B, C, T = data.shape
        d2 = jnp.take(data, jnp.asarray(arrays["idx2"], jnp.int32), axis=0)
        x = data.reshape(B * C, 1, T)
        y = d2.reshape(B * C, 1, T)
        c1 = jnp.asarray(arrays["ch_c1"]).reshape(-1, 1)
        c2 = jnp.asarray(arrays["ch_c2"]).reshape(-1, 1)
        last = jnp.asarray(arrays["ch_last"]).reshape(-1, 1)
        out = jax.vmap(
            lambda a, b, ds, ss, ln: piecewise_mix(
                a, b, ds, ss, ln,
                jnp.ones_like(ds), jnp.zeros(ds.shape, a.dtype),
                base_is_d1=True,
            )
        )(x, y, c1, c2, last - c1)
        out = zero_after(out, last.reshape(-1)).reshape(B, C, T)
        target_ohe = _blend_targets(target_ohe, arrays["idx2"], arrays["lam_t"])
        return out, target_ohe

    def _plan_lc_nointrusion(self, step, frames, labels):
        """Candidate-pool construction (augmentations.py:1228-1259)."""
        import random as _random

        B = len(labels)
        mult = 4
        idx_by_class = [
            [i for i, t in enumerate(labels) if int(t) == c]
            for c in range(self.cfg.num_classes)
        ]
        n_per_class = [len(ix) for ix in idx_by_class]
        idx1, idx2 = [], []
        for c in range(self.cfg.num_classes):
            drawn1 = _random.Random(step * 131071 + 178397654).choices(
                idx_by_class[c], k=len(idx_by_class[c]) * mult
            )
            # reference quirk (augmentations.py:1237-1239): label_indices1[i]
            # is REASSIGNED before the second k is computed, so the partner
            # draw is mult× longer per class (16n, not 4n).  zip() below then
            # truncates, which pairs every class-1 candidate with a partner
            # from class 0's oversized block — cross-class splices by
            # accident.  Reproduced bit-exactly; see PARITY.md.
            drawn2 = _random.Random(step * 8191 + 99999).choices(
                idx_by_class[c], k=len(drawn1) * mult
            )
            idx1.append(drawn1)
            idx2.append(drawn2)
        flat1 = [i for sub in idx1 for i in sub]
        flat2 = [i for sub in idx2 for i in sub]
        both = list(zip(flat1, flat2))
        _random.Random(step).shuffle(both)
        idx1 = np.array([p[0] for p in both], np.int64)
        idx2 = np.array([p[1] for p in both], np.int64)
        cut = self._cut_choice(step)
        arrays, f_new = self._concat_piece_arrays(frames, idx2, cut, idx1=idx1)
        arrays["idx1"] = idx1
        arrays["idx2"] = idx2
        if "cutout" in self.spec.raw:
            lo, hi = prng.py_sorted_uniform_pair(step)
            arrays["bb"] = np.stack(
                [(lo * f_new[:, -1]).astype(np.int64),
                 (hi * f_new[:, -1]).astype(np.int64)], axis=1
            )
        return Plan(
            arrays=arrays, mix_indices=idx1, frames_new=f_new, cut=cut,
            aux={"n_per_class": n_per_class, "cand_labels": labels[idx1]},
        )

    def lc_select(self, losses: np.ndarray, cand_labels: np.ndarray,
                  n_per_class: list[int]) -> np.ndarray:
        """Keep the lowest-loss candidates per class, original counts,
        in ascending index order (augmentations.py:1266-1277)."""
        keep = []
        for c, n in enumerate(n_per_class):
            members = np.where(cand_labels == c)[0]
            order = members[np.argsort(losses[members], kind="stable")]
            keep.extend(order[:n].tolist())
        return np.array(sorted(keep), np.int64)

    def _plan_swapsysdia(self, step, frames):
        """Re-concatenate S1(d1)+sys(d2)+S2(d1)+dia(d2) (augmentations.py:1335-1353)."""
        B = frames.shape[0]
        mix = pairing_mod.mix_all(B, step)
        f1, f2 = frames, frames[mix]
        s1 = f1[:, 1] - f1[:, 0]
        s2 = f1[:, 3] - f1[:, 2]
        sys2 = f2[:, 2] - f2[:, 1]
        dia2 = f2[:, 4] - f2[:, 3]
        d0 = np.zeros(B, np.int64)
        dst = np.stack([d0, s1, s1 + sys2, s1 + sys2 + s2], axis=1)
        src = np.stack([f1[:, 0], f2[:, 1], f1[:, 2], f2[:, 3]], axis=1)
        ln = np.stack([s1, sys2, s2, dia2], axis=1)
        sel = np.tile(np.array([0, 1, 0, 1], np.int64), (B, 1))
        alpha = np.zeros((B, 4), np.float32)
        lam_t = ((s1 + s2) / np.maximum(s1 + sys2 + s2 + dia2, 1)).astype(np.float32)
        arrays = {"idx1": np.arange(B, dtype=np.int64), "idx2": mix,
                  "dst": dst, "src": src, "len": ln, "sel": sel, "alpha": alpha,
                  "lam_t": lam_t}
        return Plan(arrays=arrays, mix_indices=mix)

    def _plan_cont_cutmix(self, step, frames):
        """Splice a window of d2 into d1 at matching relative positions
        (augmentations.py:1356-1394)."""
        B = frames.shape[0]
        mix = pairing_mod.mix_all(B, step)
        lo, hi = prng.py_sorted_uniform_pair(step)
        d1_len = frames_end(frames)
        d2_len = frames_end(frames[mix])
        bb1 = np.stack([(lo * d1_len).astype(np.int64), (hi * d1_len).astype(np.int64)], 1)
        bb2 = np.stack([(lo * d2_len).astype(np.int64), (hi * d2_len).astype(np.int64)], 1)
        seg2 = bb2[:, 1] - bb2[:, 0]
        z = np.zeros(B, np.int64)
        dst = np.stack([z, bb1[:, 0], bb1[:, 0] + seg2], axis=1)
        src = np.stack([z, bb2[:, 0], bb1[:, 1]], axis=1)
        ln = np.stack([bb1[:, 0], seg2, d1_len - bb1[:, 1]], axis=1)
        sel = np.tile(np.array([0, 1, 0], np.int64), (B, 1))
        alpha = np.zeros((B, 3), np.float32)
        lam = np.float32(1.0 - (hi - lo))
        arrays = {"idx1": np.arange(B, dtype=np.int64), "idx2": mix,
                  "dst": dst, "src": src, "len": ln, "sel": sel, "alpha": alpha,
                  "lam_t": np.full(B, lam, np.float32)}
        return Plan(arrays=arrays, mix_indices=mix)

    def _plan_saliency_cutmix(self, step, frames, labels, saliency_bins_fn):
        """Bin-level saliency-driven splicing (augmentations.py:1396-1470)."""
        B = frames.shape[0]
        mix = pairing_mod.mix_all(B, step)
        bin_values, bin_frames = saliency_bins_fn()
        quasi_lam = prng.np_beta_lambda(1.0, step)
        nbins = bin_values.shape[1]  # 14
        dst = np.zeros((B, nbins), np.int64)
        src = np.zeros((B, nbins), np.int64)
        ln = np.zeros((B, nbins), np.int64)
        sel = np.zeros((B, nbins), np.int64)
        lam_t = np.zeros(B, np.float32)
        f_new = np.zeros((B, 5), np.int64)
        for i in range(B):
            bv1, bv2 = bin_values[i], bin_values[mix[i]]
            bf1, bf2 = bin_frames[i], bin_frames[mix[i]]
            thr_idx = min(int(quasi_lam * nbins), nbins - 1)
            thr = np.sort(bv2)[::-1][thr_idx]
            pos = 0
            took = [0, 0]
            for j in range(nbins):
                if j in (0, 5):  # S1 / S2 bins keep the more salient source
                    use2 = not (bv1[j] > bv2[j])
                else:
                    use2 = bv2[j] >= thr
                bf = bf2 if use2 else bf1
                # reference bin starts overshoot short segments
                # (saliency.py:130: arange(bins)*ceil(L/bins)), making raw
                # diffs negative there; the handler's np.append slices clip
                # those to EMPTY for placement (the cursor never moves
                # backwards) while its λ bookkeeping adds the raw diff
                # (augmentations.py:1434-1452) — mirror both exactly
                L_raw = int(bf[j + 1] - bf[j])
                L_eff = max(0, L_raw)
                dst[i, j] = pos
                src[i, j] = bf[j]
                ln[i, j] = L_eff
                sel[i, j] = int(use2)
                took[int(use2)] += L_raw
                pos += L_eff
            lam_t[i] = took[0] / max(took[0] + took[1], 1)
            # frames of the new instance at S1/sys/S2/dia boundaries
            f_new[i] = [0, dst[i, 1], dst[i, 5], dst[i, 6],
                        min(pos, self.cfg.sig_len)]
        arrays = {"idx1": np.arange(B, dtype=np.int64), "idx2": mix,
                  "dst": dst, "src": src, "len": ln, "sel": sel,
                  "alpha": np.zeros((B, nbins), np.float32), "lam_t": lam_t}
        return Plan(arrays=arrays, mix_indices=mix, frames_new=f_new,
                    aux={"quasi_lam": quasi_lam})

    # ---------------- masks & 1-D cutout ---------------- #

    def _plan_cutout_1d(self, step, frames):
        spec = self.spec
        B = frames.shape[0]
        if spec.manifold:
            depth = prng.py_randint(step, 0, 3)
        else:
            depth = None
        if spec.per_channel:
            C = self.cfg.num_channels
            bb = np.zeros((B, C, 2), np.int64)
            end = frames_end(frames)
            for c in range(C):
                draws = sorted(
                    prng.py_uniform(step + i * 131071 + c * 524287) for i in range(2)
                )
                bb[:, c, 0] = (draws[0] * end).astype(np.int64)
                bb[:, c, 1] = (draws[1] * end).astype(np.int64)
            return Plan(arrays={"bb": bb}, latent_depth=depth)
        lo, hi = prng.py_masked_region(step, spec.params[0])
        bb = np.stack(
            [(lo * frames_end(frames)).astype(np.int64),
             (hi * frames_end(frames)).astype(np.int64)], axis=1
        )
        return Plan(arrays={"bb": bb}, latent_depth=depth)

    def _mask_arrays_2d(self, step, frames):
        """Shared time/freq mask draws for the 2-D methods
        (augmentations2d.py:309-325, :449-458, :474-507)."""
        spec, F = self.spec, self.cfg.spec_freq
        u_gap = prng.py_uniform(step + 131071)
        u_pos = prng.py_uniform(step + 13119)
        arrays = {}
        base = spec.base
        if base in ("timemask", "durmixtimemask", "cutout", "durmixcutout"):
            tmax = spec.params[0]
            gap = u_gap * tmax
            t1 = u_pos * (1 - gap)
            t2 = t1 + gap
            arrays["bb"] = np.stack(
                [(t1 * frames_end(frames)).astype(np.int64),
                 (t2 * frames_end(frames)).astype(np.int64)], axis=1
            )
        if base in ("freqmask", "durmixfreqmask", "cutout", "durmixcutout"):
            fmax = spec.params[1] if base in ("cutout", "durmixcutout") else spec.params[0]
            gap = u_gap * fmax
            h1 = int(F * (u_pos * (1 - gap)))
            h2 = min(F, h1 + int(gap * F))
            arrays["fbb"] = np.array([h1, h2], np.int64)
        return arrays

    def _resp_arrays(self, u, rmin, rmax):
        """Respiratory sinusoid parameters (augmentations.py:765-773)."""
        rate = rmin + u * (rmax - rmin)
        phase = u * 2.0 * np.pi
        T, sr = self.cfg.sig_len, self.cfg.sample_rate
        t = np.linspace(0, T / sr, T)
        sinusoid = np.sin(2 * np.pi * rate * t + phase).astype(np.float32)
        return {"sinusoid": sinusoid}

    def _latent_depth(self, step):
        """latentmixup depth draw (augmentations.py:1483-1494).  The reference
        fixes depth for FCN (4) and ResCNN (5) and draws randint(1, max) for
        Potes/resnet9/Singstad; its randint line would NameError for
        FCN/ResCNN, so the fixed values win there."""
        name = self.cfg.model
        if name == "FCN":
            return 4
        if name == "ResCNN":
            return 5
        return prng.py_randint(step, 1, max_latent_depth(name))

    # ------------------------------------------------------------------ #
    # scan support: structure-stable plans for multi-step dispatch
    # ------------------------------------------------------------------ #
    def plan_arrays_or_identity(self, step, frames, labels, wavs=None, **kw):
        """Like :meth:`plan`, but ALWAYS returns an arrays dict with the
        method's fixed structure: probability-gated-off steps come back as
        identity plans (apply == no-op), so per-step plans can be stacked and
        scanned in one dispatch (train.steps.make_multi_step).

        Returns (arrays, plan_or_None)."""
        plan = self.plan(step, frames, labels, wavs, **kw)
        if plan is not None:
            return plan.arrays, plan
        return self.identity_arrays(step, frames, labels, wavs, **kw), None

    def has_identity_template(self, frames, labels) -> bool:
        """True when identity_arrays for this (batch, frames-width) key is
        already cached — callers can then skip building the frozen-model
        hook kwargs, which only matter on the one-time template build."""
        cache = getattr(self, "_identity_cache", None) or {}
        return (len(labels), np.asarray(frames).shape[-1]) in cache

    def identity_arrays(self, step, frames, labels, wavs=None, **kw):
        """A no-op plan with the method's array structure, cached per batch
        size.  The identity rewrite depends only on shapes, so one forced
        template build per batch size suffices; the build runs under a
        snapshot of the mirror NumPy stream / noise key so a gated-off step
        consumes no RNG (matching the reference, which skips the handler
        entirely).  Treat the returned dict as read-only."""
        if self.spec.base in ("lc-nointrusion", "saliency-cutmix"):
            # these methods change the batch row count / build pieces from
            # model-dependent bins — an arange identity rewrite would be
            # shape-inconsistent (lc) or zero the batch (saliency-cutmix).
            # The scan path excludes them (train/loop.py use_resident).
            raise NotImplementedError(
                f"identity plans are not defined for {self.spec.base!r}"
            )
        cache = getattr(self, "_identity_cache", None)
        if cache is None:
            cache = self._identity_cache = {}
        B = len(labels)
        # key on frames geometry too: a full-variant engine (27-wide frames)
        # and a cycle engine (5-wide) at the same batch size must not share
        # an identity template — the piece counts differ.
        fkey = (B, np.asarray(frames).shape[-1])
        if fkey not in cache:
            np_state = self.np_stream.get_state()
            noise_key = self._noise_key
            try:
                forced = self.plan(step, frames, labels, wavs, _force=True, **kw)
            finally:
                self.np_stream.set_state(np_state)
                self._noise_key = noise_key
            cache[fkey] = self._identity_arrays(forced.arrays, B)
        return cache[fkey]

    def _identity_arrays(self, arrays: dict, batch: int) -> dict:
        """Rewrite a plan's arrays so apply() is the identity."""
        T = self.cfg.sig_len
        base = self.spec.base
        out = {}
        for k, v in arrays.items():
            out[k] = np.array(v, copy=True) if isinstance(v, np.ndarray) else v
        idn = np.arange(batch, dtype=np.int64)
        for k in ("mix", "idx1", "idx2"):
            if k in out:
                out[k] = idn
        if "len" in out:
            out["len"][:] = 0
            if base in ("labelcutmix", "lengthcutmix", "datasetcutmix",
                        "wavcutmix", "cutmix", "swapsysdia", "cont-cutmix",
                        "lc-nointrusion"):
                # concat-style applies start from zeros: piece 0 must copy d1
                out["dst"][:] = 0
                out["src"][:] = 0
                out["sel"][:] = 0
                out["alpha"][:] = 0.0
                out["len"][:, 0] = T
        if "lam" in out:
            out["lam"] = np.float32(1.0)
        if "lam_t" in out:
            out["lam_t"] = np.ones_like(out["lam_t"])
        if "knots" in out:
            out["knots"] = np.ones_like(out["knots"])
        if "sinusoid" in out:
            out["sinusoid"] = np.ones_like(out["sinusoid"])
        for k in ("bb", "bb1", "bb2", "fbb", "ov"):
            if k in out:
                out[k] = np.zeros_like(out[k])
        if "snr" in out:
            out["snr"] = np.full_like(out["snr"], 300.0)  # noise std → ~0
        if "end" in out:
            out["end"] = np.full_like(out["end"], T)  # zero_after past the end
        for k in ("ch_c1", "ch_c2", "ch_last"):
            if k in out:
                out[k] = np.full_like(out[k], T)
        return out

    # ------------------------------------------------------------------ #
    # device: apply (jit-traceable; static structure fixed by self.spec)
    # ------------------------------------------------------------------ #
    def _shard_map_pallas(self, fn, rows, *plan_arrays):
        """Run a pre-paired Pallas kernel under the DP mesh: every input is
        batch-leading and sharded on the mesh axis, so the kernel sees only
        shard-local rows (the cross-shard pair gather already happened in
        XLA)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec

        mesh = self.cfg.mesh
        p = PartitionSpec(mesh.axis_names[0])
        args = tuple(rows) + tuple(jnp.asarray(a) for a in plan_arrays)
        return shard_map(
            fn, mesh=mesh, in_specs=(p,) * len(args), out_specs=p,
            check_vma=False,
        )(*args)

    def _pallas_mix_rows(self, data, idx1, idx2, arrays, *, base_is_d1):
        """Dispatch the piecewise mix kernel, mesh-aware.  idx1=None means
        identity (output row i blends data[i] with data[idx2[i]]).  Returns
        None when the output batch cannot be sharded over the mesh (caller
        falls back to the XLA path)."""
        from pcgmix_tpu.ops.pallas_mix import (
            piecewise_mix_pairs_pallas,
            piecewise_mix_prepaired_pallas,
        )

        cfg = self.cfg
        i32 = lambda x: jnp.asarray(x, jnp.int32)
        plan = (arrays["dst"], arrays["src"], arrays["len"], arrays["sel"],
                arrays["alpha"])
        if cfg.mesh is None:
            if idx1 is None:
                idx1 = jnp.arange(data.shape[0], dtype=jnp.int32)
            return piecewise_mix_pairs_pallas(
                data, i32(idx1), i32(idx2), *plan,
                base_is_d1=base_is_d1, interpret=cfg.pallas_interpret,
            )
        n_out = data.shape[0] if idx1 is None else np.shape(idx1)[0]
        if n_out % cfg.mesh.size:
            return None
        d1_rows = data if idx1 is None else jnp.take(data, i32(idx1), axis=0)
        d2_rows = jnp.take(data, i32(idx2), axis=0)

        def fn(a, b, dst, src, ln, sel, al):
            return piecewise_mix_prepaired_pallas(
                a, b, dst, src, ln, sel, al,
                base_is_d1=base_is_d1, interpret=cfg.pallas_interpret,
            )

        return self._shard_map_pallas(fn, (d1_rows, d2_rows), *plan)

    def _fused_magwarp_apply(self, data, arrays):
        """durmixmagwarp fast path: one kernel for pair fetch + segment
        blend + spline warp (mesh-aware)."""
        from pcgmix_tpu.ops.pallas_mix import (
            pcgmix_plus_fused_pallas,
            pcgmix_plus_fused_prepaired_pallas,
        )

        cfg = self.cfg
        plan = (arrays["dst"], arrays["src"], arrays["len"], arrays["sel"],
                arrays["alpha"], arrays["knots"])
        if cfg.mesh is None:
            return pcgmix_plus_fused_pallas(
                data, arrays["mix"], *plan, interpret=cfg.pallas_interpret
            )
        if data.shape[0] % cfg.mesh.size:
            return None  # caller falls back to the unfused path
        d2_rows = jnp.take(data, jnp.asarray(arrays["mix"], jnp.int32), axis=0)

        def fn(a, b, dst, src, ln, sel, al, kn):
            return pcgmix_plus_fused_prepaired_pallas(
                a, b, dst, src, ln, sel, al, kn,
                interpret=cfg.pallas_interpret,
            )

        return self._shard_map_pallas(fn, (data, d2_rows), *plan)

    def _keepdur_apply(self, data, arrays):
        if self.cfg.use_pallas:
            if data.ndim == 3:
                out = self._pallas_mix_rows(
                    data, None, arrays["mix"], arrays, base_is_d1=True
                )
                if out is not None:
                    return out
            elif data.ndim == 4 and data.shape[1] == 1:
                # spectrograms (B, 1, F, T): frequency rows broadcast across
                # the time-axis pieces exactly like channels do
                out = self._pallas_mix_rows(
                    data[:, 0], None, arrays["mix"], arrays, base_is_d1=True
                )
                if out is not None:
                    return out[:, None]
        d2 = jnp.take(data, jnp.asarray(arrays["mix"], jnp.int32), axis=0)
        return _vmapped_pieces(data, d2, arrays)

    def apply(self, data, target_ohe, arrays):
        """Apply a plan to the device batch.  Returns (data, target_ohe).

        For latentmixup / manifold methods this is called on the *latent*
        tensor produced by the trainer's part='first' pass.
        """
        spec, cfg = self.spec, self.cfg
        base = spec.base
        if base in ("durratiomixup", "durmixmagwarp", "durmixrespscale",
                    "durmixfreqmask", "durmixtimemask", "durmixcutout"):
            if base == "durmixmagwarp" and cfg.use_pallas and data.ndim == 3:
                # one fused kernel: pair gather + segment blend + spline warp
                out = self._fused_magwarp_apply(data, arrays)
                if out is not None:
                    if spec.mix_all_targets:
                        target_ohe = _blend_targets(
                            target_ohe, arrays["mix"], arrays["lam"]
                        )
                    return out, target_ohe
            out = self._keepdur_apply(data, arrays)
            if spec.mix_all_targets:
                target_ohe = _blend_targets(target_ohe, arrays["mix"], arrays["lam"])
            if base == "durmixmagwarp":
                out = magnitude_warp(out, arrays["knots"])
            if base == "durmixrespscale":
                out = out * arrays["sinusoid"]
            if base in ("durmixtimemask", "durmixcutout", "durmixfreqmask"):
                out = self._apply_mask_2d(out, arrays)
            return out, target_ohe
        if base in ("durratiocutmix", "(UMC-subset)durratiocutmix",
                    "wav-durratiocutmix"):
            return self._keepdur_apply(data, arrays), target_ohe
        if base in ("mixup", "latentmixup"):
            lam = arrays["lam"]
            out = _blend(data, arrays["mix"], lam)
            if spec.mix_all_targets:
                target_ohe = _blend_targets(target_ohe, arrays["mix"], lam)
            return out, target_ohe
        if base == "timemask" and not cfg.spectrogram:
            return _mask_bb(data, arrays["bb"]), target_ohe
        if base == "respiratoryscale":
            return data * arrays["sinusoid"], target_ohe
        if base == "magnitudewarp":
            return magnitude_warp(data, arrays["knots"]), target_ohe
        if base == "timewarp":
            return time_warp(data, arrays["knots"]), target_ohe
        if base == "gaussiannoise":
            rms = jnp.sqrt(jnp.mean(jnp.square(data), axis=(1, 2), keepdims=True))
            std = rms / jnp.power(10.0, arrays["snr"][:, None, None] / 20.0)
            noise = jax.random.normal(arrays["key"], data.shape, data.dtype)
            return zero_after(data + noise * std, arrays["end"]), target_ohe
        if base == "cutmix" and spec.per_channel:
            return self._apply_concat_per_channel(data, target_ohe, arrays)
        if base in ("labelcutmix", "lengthcutmix", "datasetcutmix", "wavcutmix",
                    "cutmix", "lc-nointrusion", "swapsysdia", "cont-cutmix",
                    "saliency-cutmix"):
            out = None
            if cfg.use_pallas and data.ndim == 3 and not spec.smooth:
                out = self._pallas_mix_rows(
                    data, arrays["idx1"], arrays["idx2"], arrays,
                    base_is_d1=False,
                )
            if out is None:
                out = _concat_pieces_apply(data, arrays, smooth=spec.smooth)
            if "bb" in arrays:
                out = _mask_bb(out, arrays["bb"])
            if "lam_t" in arrays:
                target_ohe = _blend_targets(target_ohe, arrays["idx2"], arrays["lam_t"])
            elif base == "lc-nointrusion":
                target_ohe = jnp.take(
                    target_ohe, jnp.asarray(arrays["idx1"], jnp.int32), axis=0
                )
            return out, target_ohe
        if base == "cutout" and not cfg.spectrogram:
            return _mask_bb(data, arrays["bb"]), target_ohe
        if base == "s1s2mask":
            out = _mask_bb(data, arrays["bb1"])
            return _mask_bb(out, arrays["bb2"]), target_ohe
        if cfg.spectrogram and base in ("cutout", "timemask", "freqmask"):
            return self._apply_mask_2d(data, arrays), target_ohe
        raise NotImplementedError(f"apply for method base {base!r}")

    def _apply_mask_2d(self, data, arrays):
        """(B, C, F, T) spectrogram masks: time window per sample and/or a
        shared frequency band (augmentations2d.py:322-325, :455-458)."""
        out = data
        if "bb" in arrays and "fbb" in arrays:
            F, T = data.shape[-2], data.shape[-1]
            fb = arrays["fbb"]
            fmask = (jnp.arange(F) >= fb[0]) & (jnp.arange(F) < fb[1])
            tmask = interval_mask(T, arrays["bb"][:, 0], arrays["bb"][:, 1]).astype(bool)
            box = fmask[None, None, :, None] & tmask[:, None, None, :]
            return jnp.where(box, jnp.zeros((), data.dtype), out)
        if "bb" in arrays:
            return _mask_bb(out, arrays["bb"])
        if "fbb" in arrays:
            F = data.shape[-2]
            fb = arrays["fbb"]
            fmask = (jnp.arange(F) >= fb[0]) & (jnp.arange(F) < fb[1])
            return jnp.where(
                fmask[None, None, :, None], jnp.zeros((), data.dtype), out
            )
        return out
