"""Mix-pair selection (SURVEY.md §2 component 11).

Builds, on the host, the within-batch partner permutation used by every
mixing method.  All the cheap constraint shuffles reproduce the reference's
``random.Random(step)`` protocol bit-exactly via
:func:`pcgmix_tpu.rng.grouped_shuffle`; the latent-distance TSP pairings
(closestknn/closestbins, augmentations.py:386-498) stay on host (batch≈64)
and feed the device a plain index array.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import numpy as np

from pcgmix_tpu import rng as prng
from pcgmix_tpu.augment.tsp import solve_tsp_greedy, solve_tsp_local_search


def same_label(labels: np.ndarray, seed: int) -> np.ndarray:
    """Shuffle within class labels (augmentations.py:500-514)."""
    return prng.grouped_shuffle([int(t) for t in labels], seed)


def same_cvd(wavs: Sequence[str], cvd_map: dict, seed: int) -> np.ndarray:
    """Shuffle within cardiovascular-disease groups (augmentations.py:516-526).

    ``cvd_map`` maps wav name → diagnosis (the reference reads this from an
    out-of-repo cvds_map.csv, augmentations.py:26-28)."""
    return prng.grouped_shuffle([cvd_map[w] for w in wavs], seed)


def same_wav(wavs: Sequence[str], seed: int) -> np.ndarray:
    """Shuffle within recordings (augmentations.py:528-540)."""
    return prng.grouped_shuffle(list(wavs), seed)


def same_dataset(labels: np.ndarray, wavs: Sequence[str], seed: int) -> np.ndarray:
    """Shuffle within (PhysioNet subset letter, label) groups
    (augmentations.py:542-556)."""
    keys = [f"{w[0]}_{int(t)}" for w, t in zip(wavs, labels)]
    return prng.grouped_shuffle(keys, seed)


def same_umc_subset(labels: np.ndarray, wavs: Sequence[str], seed: int) -> np.ndarray:
    """Shuffle within (UMC old/new subset, label) groups
    (augmentations.py:632-653): 3-digit patient ids are 'new'."""
    keys = [
        f"{'new' if len(w.split('_')[0]) == 3 else 'old'}_{int(t)}"
        for w, t in zip(wavs, labels)
    ]
    return prng.grouped_shuffle(keys, seed)


def same_length(
    labels: np.ndarray,
    frames: np.ndarray,
    seed: int,
    batch_size: int,
    num_bins: int = 0,
) -> np.ndarray:
    """Shuffle within (label, heartbeat-length bin) groups
    (augmentations.py:558-582).  num_bins=0 → batch_size//100 default."""
    lengths = [int(f[-1]) for f in frames]
    lo, hi = np.min(lengths), np.max(lengths)
    nb = num_bins if num_bins else batch_size // 100
    nb = max(nb, 1)
    bins = np.linspace(lo - 1, hi + 1, nb + 1)
    binned = np.digitize(lengths, bins)
    keys = [f"{int(t)}_{b}" for t, b in zip(labels, binned)]
    return prng.grouped_shuffle(keys, seed)


def mix_all(size: int, seed: int) -> np.ndarray:
    """Unconstrained shuffle (augmentations.py:950-951)."""
    return prng.py_shuffled_permutation(seed, size)


def _rankings(dist: np.ndarray, k: int) -> np.ndarray:
    """Distance→ranking matrix with the k nearest collapsed to rank 1
    (distances_to_rankings, augmentations.py:372-384)."""
    m = dist.shape[0]
    r = np.zeros_like(dist, dtype=int)
    for i in range(m):
        order = np.argsort(dist[i])
        r[i, order] = np.arange(m)
        r[i, order[1 : k + 1]] = 1
        r[i, order[k + 1 :]] -= k - 1
    return r


def _tsp_pairing_per_label(
    labels: np.ndarray, dist_by_label: dict, refine: bool
) -> np.ndarray:
    """Solve a TSP per class and pair each element with its tour successor
    (the pairing trick of augmentations.py:422-433)."""
    size = len(labels)
    groups: dict = {}
    for i, t in enumerate(labels):
        groups.setdefault(int(t), []).append(i)
    mix = np.arange(size)
    for label, dist in dist_by_label.items():
        path = solve_tsp_greedy(dist)
        if refine:
            path, _ = solve_tsp_local_search(dist, path[:-1])
            path = path + [path[0]]
        first = np.array(path[:-1])
        second = np.roll(path[:-1], -1)
        members = np.array(groups[label])
        mix[members[first]] = mix[members[second]]
    return mix


def closest_knn(
    labels: np.ndarray,
    latent: np.ndarray,
    k_num: int,
    seed: int,
    batch_size: int,
) -> tuple[np.ndarray, float]:
    """kNN-ranked latent-distance TSP pairing (augmentations.py:386-438).

    Returns (mix_indices, total latent distance of the pairing) — the
    reference dumps the distance to closestknn/totaldistance_<step>.txt.
    """
    size = len(labels)
    if k_num >= batch_size:
        mix = same_label(labels, seed)
        return mix, _total_distance(latent, mix)
    dist_by_label = {}
    for label in (0, 1):
        members = [i for i, t in enumerate(labels) if int(t) == label]
        if len(members) < 2:
            continue  # nothing to pair within this class; rows stay identity
        fts = latent[members]
        d = np.linalg.norm(fts[:, None] - fts[None, :], axis=-1)
        dist_by_label[label] = _rankings(d, k_num)
    mix = _tsp_pairing_per_label(labels, dist_by_label, refine=True)
    return mix, _total_distance(latent, mix)


def closest_bins(
    labels: np.ndarray, latent: np.ndarray, num_bins: int, seed: int
) -> tuple[np.ndarray, float]:
    """Binned latent-distance TSP pairing (augmentations.py:440-498)."""
    size = len(labels)
    if num_bins == 1:
        mix = same_label(labels, seed)
        return mix, _total_distance(latent, mix)
    dists, members_by_label = {}, {}
    for label in (0, 1):
        members = [i for i, t in enumerate(labels) if int(t) == label]
        if len(members) < 2:
            continue  # nothing to pair within this class; rows stay identity
        fts = latent[members]
        d = np.linalg.norm(fts[:, None] - fts[None, :], axis=-1)
        dists[label] = d
        members_by_label[label] = members
    if not dists:
        mix = np.arange(size)
        return mix, _total_distance(latent, mix)
    upper = {l: d[np.triu_indices_from(d, k=1)] for l, d in dists.items()}
    all_max = max(u.max() for u in upper.values())
    all_min = min(u.min() for u in upper.values())
    edges = np.linspace(all_min, all_max, num_bins + 1)
    dist_by_label = {}
    for label, d in dists.items():
        b = np.clip(np.digitize(d, edges, right=True), 1, num_bins)
        np.fill_diagonal(b, 0)
        dist_by_label[label] = b
    mix = _tsp_pairing_per_label(labels, dist_by_label, refine=False)
    return mix, _total_distance(latent, mix)


def _total_distance(latent: np.ndarray, mix: np.ndarray) -> float:
    return float(np.sum(np.linalg.norm(latent - latent[mix], axis=1)))


def optimal_saliency(
    labels: np.ndarray,
    saliency_overlap: np.ndarray,
) -> np.ndarray:
    """Saliency-overlap-optimal pairing (augmentations.py:584-630).

    ``saliency_overlap[i, j]`` is the max achievable summed saliency of the
    overlapped systole+diastole windows of samples i and j (symmetric).  The
    reference maximizes overlap by flipping it into a minimization TSP.
    (Note: the reference's own implementation calls an undefined
    ``opt_sal_overlap`` helper — this is its reconstructed intent.)
    """
    size = len(labels)
    groups: dict = {}
    for i, t in enumerate(labels):
        groups.setdefault(int(t), []).append(i)
    mix = np.arange(size)
    for label, members in groups.items():
        sub = saliency_overlap[np.ix_(members, members)]
        dist = sub.max() - sub
        np.fill_diagonal(dist, 0)
        path = solve_tsp_greedy(dist)
        first = np.array(path[:-1])
        second = np.roll(path[:-1], -1)
        members = np.array(members)
        mix[members[first]] = mix[members[second]]
    return mix


def build_pairing(
    spec,
    step: int,
    labels: np.ndarray,
    frames: np.ndarray,
    wavs: Optional[Sequence[str]],
    batch_size: int,
    cvd_map: Optional[dict] = None,
    latent_fn: Optional[Callable[[], np.ndarray]] = None,
) -> tuple[np.ndarray, Optional[float]]:
    """Dispatch on spec.pairing.  ``latent_fn`` lazily computes the latent
    features (device round-trip) only for closestknn/closestbins."""
    size = len(labels)
    if spec.pairing == "same_label":
        return same_label(labels, step), None
    if spec.pairing == "same_cvd":
        if cvd_map is None:
            raise ValueError("(sameCVD) pairing requires a cvd_map (wav→diagnosis)")
        return same_cvd(wavs, cvd_map, step), None
    if spec.pairing == "same_wav":
        return same_wav(wavs, step), None
    if spec.pairing == "same_dataset":
        return same_dataset(labels, wavs, step), None
    if spec.pairing == "same_umc_subset":
        return same_umc_subset(labels, wavs, step), None
    if spec.pairing == "same_length":
        return same_length(labels, frames, step, batch_size, spec.pairing_param), None
    if spec.pairing == "mix_all":
        return mix_all(size, step), None
    if spec.pairing == "closestknn":
        mix, d = closest_knn(labels, latent_fn(), spec.pairing_param, step, batch_size)
        return mix, d
    if spec.pairing == "closestbins":
        mix, d = closest_bins(labels, latent_fn(), spec.pairing_param, step)
        return mix, d
    raise ValueError(f"unknown pairing {spec.pairing!r}")
