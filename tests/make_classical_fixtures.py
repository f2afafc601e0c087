"""Generate value-level golden fixtures for pcgmix_tpu.classical.dsp from
the REAL reference libraries (librosa 0.9.2 + PyWavelets + antropy — the
reference's requirements.txt stack, /root/reference/classical.py:245-1292).

Those libraries are not in the build image, so run this script ONCE in an
environment that has them:

    pip install librosa==0.9.2 PyWavelets antropy
    python tests/make_classical_fixtures.py

and commit the resulting tests/golden/classical_dsp_v1.npz.
tests/test_classical_dsp_oracle.py picks the file up automatically (the
golden test skips, with a pointer here, while the fixture is absent).
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "golden", "classical_dsp_v1.npz")

SR = 1000
N_FFT = 256
HOP = 64


def make_signals() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(1234)
    t = np.arange(900) / SR
    return {
        "noise": rng.standard_normal(900).astype(np.float64),
        "tone": np.sin(2 * np.pi * 55.0 * t),
        "mix": (
            np.sin(2 * np.pi * 30.0 * t)
            + 0.5 * np.sin(2 * np.pi * 120.0 * t)
            + 0.1 * rng.standard_normal(900)
        ),
        "short": rng.standard_normal(40),
    }


def main():
    import antropy
    import librosa
    import pywt

    out = {}
    for name, y in make_signals().items():
        y32 = y.astype(np.float32)
        out[f"{name}/signal"] = y
        out[f"{name}/rms"] = librosa.feature.rms(
            y=y32, frame_length=N_FFT, hop_length=HOP
        )[0]
        out[f"{name}/zcr"] = np.array(float(librosa.zero_crossings(y32).sum()))
        kw = dict(y=y32, sr=SR, n_fft=N_FFT, hop_length=HOP)
        out[f"{name}/centroid"] = librosa.feature.spectral_centroid(**kw)[0]
        out[f"{name}/bandwidth"] = librosa.feature.spectral_bandwidth(**kw)[0]
        out[f"{name}/flatness"] = librosa.feature.spectral_flatness(
            y=y32, n_fft=N_FFT, hop_length=HOP
        )[0]
        out[f"{name}/rolloff"] = librosa.feature.spectral_rolloff(**kw)[0]
        # the reference's contrast parameters (classical.py:921-923)
        out[f"{name}/contrast"] = librosa.feature.spectral_contrast(
            **kw, fmin=25, n_bands=5
        )
        out[f"{name}/poly"] = librosa.feature.poly_features(**kw, order=1)
        out[f"{name}/chroma"] = librosa.feature.chroma_stft(**kw, tuning=0.0)
        out[f"{name}/mel"] = librosa.feature.melspectrogram(**kw)
        out[f"{name}/mfcc"] = librosa.feature.mfcc(**kw, n_mfcc=13)
        out[f"{name}/sampen"] = np.array(
            float(antropy.sample_entropy(y, order=2))
        )
        for lvl, c in enumerate(pywt.wavedec(y, "db4", level=5)):
            out[f"{name}/dwt{lvl}"] = c
    np.savez(OUT, **out)
    print(f"wrote {OUT} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
