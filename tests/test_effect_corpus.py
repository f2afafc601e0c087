"""Properties of the scientific-replication corpus (synthetic_effect_dict).

The replication argument (scripts/replicate_synthetic.py; VERDICT r3 item 2)
rests on construction guarantees this file pins:

* the ONLY label-reliable feature is the systolic murmur (class 1 adds
  in-band energy strictly inside the systole window);
* every nuisance (gain, diastolic tone, S1/S2 pitch) is drawn per RECORDING
  independent of the label;
* the reference data contract holds (zero tails beyond frames[-1], bands,
  frames monotone) so the corpus flows through the real pipeline.
"""

import numpy as np
import pytest

from pcgmix_tpu.data import synthetic_effect_dict


@pytest.fixture(scope="module")
def ds():
    return synthetic_effect_dict(
        num_wavs_train=60, num_wavs_test=8, segments_per_wav=3, sig_len=1200,
        seed=3, murmur_amp=0.3, confounder_amp=0.8, noise_amp=0.2,
    )


def _band(split):
    return split["data"]["25-45"]


def test_contract_shapes_and_zero_tail(ds):
    for split in (ds["train"], ds["test"]):
        d = _band(split)
        f = split["frames"]
        assert d.shape[1] == 1200
        assert (np.diff(f, axis=1) > 0).all()
        for i in range(len(d)):
            assert not d[i, f[i, 4]:].any(), "tail beyond diastole must be 0"


def test_murmur_only_in_class1_systole(ds):
    """Class-1 systole carries extra broadband energy; class-0 systole and
    BOTH classes' S1 windows don't differ beyond the shared noise floor.
    Compare gain-normalized residual variance (the tones are deterministic
    sinusoids; noise_amp/murmur_amp set the stochastic part)."""
    split = ds["train"]
    d, f, y = _band(split), split["frames"], split["label"]

    def systole_var(i):
        seg = d[i, f[i, 1]:f[i, 2]]
        # normalize out the per-recording gain using the diastole-window
        # noise level of the SAME row (tone is deterministic, subtract mean)
        dia = d[i, f[i, 3]:f[i, 4]]
        return seg.var() / max(dia.var(), 1e-12)

    v1 = np.median([systole_var(i) for i in np.where(y == 1)[0]])
    v0 = np.median([systole_var(i) for i in np.where(y == 0)[0]])
    assert v1 > v0, (v1, v0)


def test_nuisances_label_independent(ds):
    """Per-recording gain and confounder-tone energy must not separate the
    classes: their class-conditional means differ by less than half a
    pooled SD (they are drawn from the same distribution by construction)."""
    split = ds["train"]
    d, f, y = _band(split), split["frames"], split["label"]
    # proxy for gain×tone scale: diastole RMS (tone dominates noise there)
    rms = np.array(
        [np.sqrt(np.mean(d[i, f[i, 3]:f[i, 4]] ** 2)) for i in range(len(d))]
    )
    m1, m0 = rms[y == 1].mean(), rms[y == 0].mean()
    pooled = rms.std() + 1e-12
    assert abs(m1 - m0) < 0.5 * pooled, (m1, m0, pooled)


def test_recording_level_nuisance_consistency(ds):
    """All cycles of one wav share its nuisance draws: diastole RMS varies
    far less within a recording than across recordings."""
    split = ds["train"]
    d, f, w = _band(split), split["frames"], split["wav"]
    rms = np.array(
        [np.sqrt(np.mean(d[i, f[i, 3]:f[i, 4]] ** 2)) for i in range(len(d))]
    )
    within = []
    for name in np.unique(w):
        rows = rms[w == name]
        if len(rows) > 1:
            within.append(rows.std())
    assert np.mean(within) < 0.5 * rms.std()


def test_murmur_band_structure(ds):
    """The murmur is a TONE from murmur_band (120-180 Hz), constant per
    recording: class-1 systoles carry in-band energy class-0 ones lack, and
    the systole peak frequency agrees across cycles of one recording (the
    per-cycle draws are phase/amplitude only).  This is what makes the
    feature blend-stable under durratiomixup (see synthetic_effect_dict
    docstring) and scarce at low n_fraction (few freqs per subset)."""
    split = ds["train"]
    d, f, y, w = _band(split), split["frames"], split["label"], split["wav"]
    fs = 1000.0

    def band_frac(i):
        seg = d[i, f[i, 1]:f[i, 2]].astype(np.float64)
        spec = np.abs(np.fft.rfft(seg)) ** 2
        freqs = np.fft.rfftfreq(len(seg), 1 / fs)
        inband = spec[(freqs >= 120) & (freqs <= 180)].sum()
        return inband / max(spec.sum(), 1e-12)

    frac1 = np.median([band_frac(i) for i in np.where(y == 1)[0]])
    frac0 = np.median([band_frac(i) for i in np.where(y == 0)[0]])
    assert frac1 > 2 * frac0, (frac1, frac0)

    def peak_freq(i):
        seg = d[i, f[i, 1]:f[i, 2]].astype(np.float64)
        spec = np.abs(np.fft.rfft(seg, n=4096))
        freqs = np.fft.rfftfreq(4096, 1 / fs)
        mask = (freqs >= 120) & (freqs <= 180)
        return freqs[mask][np.argmax(spec[mask])]

    within, means = [], []
    for name in np.unique(w[y == 1]):
        rows = np.where(w == name)[0]
        peaks = [peak_freq(i) for i in rows]
        within.append(np.ptp(peaks))
        means.append(np.mean(peaks))
    # estimation noise on short windows allows a few Hz within a recording;
    # across recordings the draws cover the 60 Hz band
    assert np.median(within) < 10.0, within
    assert np.ptp(means) > 25.0, means


def test_difficulty_scales_with_amplitudes():
    """The knobs do what the replication script assumes: murmur_amp raises
    class-1 systole energy, noise_amp raises it for both classes."""
    lo = synthetic_effect_dict(
        num_wavs_train=12, num_wavs_test=0, segments_per_wav=2, sig_len=800,
        seed=5, murmur_amp=0.1, noise_amp=0.2,
    )["train"]
    hi = synthetic_effect_dict(
        num_wavs_train=12, num_wavs_test=0, segments_per_wav=2, sig_len=800,
        seed=5, murmur_amp=0.8, noise_amp=0.2,
    )["train"]

    def c1_sys_var(split):
        d, f, y = _band(split), split["frames"], split["label"]
        idx = np.where(y == 1)[0]
        return np.median([d[i, f[i, 1]:f[i, 2]].var() for i in idx])

    assert c1_sys_var(hi) > c1_sys_var(lo)
