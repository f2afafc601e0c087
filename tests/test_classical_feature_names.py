"""Machine-checked feature-NAME parity against the genuine reference.

Imports ``/root/reference/classical.py`` itself (its DSP dependencies —
librosa/pywt/antropy/… — are absent from this image, so they are stubbed
with shape-correct fakes; the *names* assigned into the returned
``pd.Series`` are pure Python and unaffected by the stub values), calls
``feature_vector_seg`` (classical.py:245-1292) on a synthetic segment, and
asserts our ``pcgmix_tpu.classical.feature_vector_seg`` emits EXACTLY the
same column names in the same order.

This replaces the previously hand-asserted "255/255 feature-name parity"
note (scripts/parity_index.py) with a test: a renamed, dropped, or
reordered feature column on either side now fails CI.

Feature *values* remain covered by the three-layer DSP oracle suite
(tests/test_classical_dsp_oracle.py); value-level goldens stay blocked on
a librosa-capable environment (ROADMAP.md).
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from pcgmix_tpu.classical import feature_vector_seg as our_feature_vector_seg

REF_CLASSICAL = Path("/root/reference/classical.py")

pytestmark = pytest.mark.skipif(
    not REF_CLASSICAL.exists(), reason="reference tree not present"
)

META_KEYS = ["class", "wav", "segment", "sig_qual", "split"]


def _mod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    return m


def _import_reference_classical():
    """Import classical.py with shape-correct stand-ins for the absent
    DSP/ML libraries.  Stub returns only need the shapes the reference
    indexes into (classical.py:646-1001); the values are irrelevant to
    the emitted names."""
    feature = _mod(
        "librosa.feature",
        chroma_stft=lambda *, y, sr, n_fft, hop_length: np.full((12, 4), 0.5),
        melspectrogram=lambda *, y, sr, n_fft, hop_length: np.full((128, 4), 0.5),
        mfcc=lambda *, y, n_mfcc, sr, n_fft, hop_length: np.full((n_mfcc, 4), 0.5),
        rms=lambda *, y, frame_length, hop_length: np.full((1, 4), 0.5),
        spectral_centroid=lambda *, y, sr, n_fft, hop_length: np.full((1, 4), 0.5),
        spectral_bandwidth=lambda *, y, sr, n_fft, hop_length: np.full((1, 4), 0.5),
        spectral_contrast=lambda *, y, sr, n_fft, fmin, hop_length, n_bands: np.full(
            (n_bands + 1, 4), 0.5
        ),
        spectral_flatness=lambda *, y, n_fft, hop_length: np.full((1, 4), 0.5),
        spectral_rolloff=lambda *, y, sr, n_fft, hop_length: np.full((1, 4), 0.5),
        poly_features=lambda *, y, sr, n_fft, hop_length: np.full((2, 4), 0.5),
    )
    librosa = _mod(
        "librosa",
        feature=feature,
        zero_crossings=lambda y: np.zeros(np.size(y), bool),
    )
    stubs = {
        "librosa": librosa,
        "librosa.feature": feature,
        "pywt": _mod(
            "pywt",
            wavedec=lambda y, wavelet, level: [np.full(4, 0.5)] * (level + 1),
        ),
        "antropy": _mod("antropy", sample_entropy=lambda y: 0.5),
        "soundfile": _mod("soundfile"),
        "pydub": _mod("pydub"),
        "imblearn": _mod("imblearn"),
        "imblearn.pipeline": _mod("imblearn.pipeline", Pipeline=object),
        "xgboost": _mod("xgboost"),
        "xgboost.sklearn": _mod("xgboost.sklearn", XGBClassifier=object),
        "lightgbm": _mod("lightgbm", LGBMClassifier=object),
        "utils": _mod("utils", check_folder=lambda p: p),
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_classical", REF_CLASSICAL
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    return mod


def _segment():
    """A positive-offset synthetic heart cycle long enough for Welch and
    the level-5 DWT; frames mark S1/systole/S2/diastole boundaries."""
    rng = np.random.default_rng(7)
    data = 0.3 + np.abs(rng.normal(size=900)).astype(np.float64)
    frames = np.array([0, 120, 420, 540, 880], np.int64)
    return data, frames


def test_feature_names_match_reference_exactly():
    ref = _import_reference_classical()
    data, frames = _segment()
    args = (data, 1, frames, "a0001", 1, 3, "train")
    ref_vec = ref.feature_vector_seg(*args)
    our_vec = our_feature_vector_seg(*args)

    ref_names = list(ref_vec.index)
    our_names = list(our_vec.index)
    assert ref_names[:5] == META_KEYS
    assert our_names[:5] == META_KEYS

    ref_feats, our_feats = ref_names[5:], our_names[5:]
    missing = sorted(set(ref_feats) - set(our_feats))
    extra = sorted(set(our_feats) - set(ref_feats))
    assert not missing and not extra, (
        f"feature-name drift: missing={missing[:10]} extra={extra[:10]}"
    )
    # pin the documented count and the exact reference emission order
    assert len(ref_feats) == 255
    assert our_feats == ref_feats


def test_our_duration_values_match_reference_on_same_segment():
    """The duration/amplitude block (classical.py:256-304) uses no stubbed
    library — on identical input the reference's computed values must
    equal ours bit-for-bit, a free value-level spot check."""
    ref = _import_reference_classical()
    data, frames = _segment()
    args = (data, 1, frames, "a0001", 1, 3, "train")
    ref_vec = ref.feature_vector_seg(*args)
    our_vec = our_feature_vector_seg(*args)
    for name in [
        "BPM", "Dur_RR", "Dur_S1", "Dur_Sys", "Dur_S2", "Dur_Dia",
        "Dur_Ratio_S1RR", "Dur_Ratio_SysRR", "Dur_Ratio_S2RR",
        "Dur_Ratio_DiaRR", "Dur_Ratio_S1S2", "Dur_Ratio_SysDia",
        "Dur_Ratio_SysS1", "Dur_Ratio_DiaS2",
        "MaxAmp_S1", "MaxAmp_Sys", "MaxAmp_S2", "MaxAmp_Dia",
        "MaxAmp_Ratio_S1S2", "MaxAmp_Ratio_SysDia", "MaxAmp_Ratio_SysS1",
        "MaxAmp_Ratio_SysS2", "MaxAmp_Ratio_DiaS1", "MaxAmp_Ratio_DiaS2",
        "Skewness_RR", "Kurtosis_RR",
    ]:
        assert float(ref_vec[name]) == float(our_vec[name]), name
