"""Builder-throughput row for BENCH.md (VERDICT r2 item #2): wavs/sec of
the offline preprocessing chain (4th-order zero-phase Butterworth band-pass
x8 bands + RMS normalize + 2 kHz → 1 kHz polyphase resample) over a
synthetic 500-wav corpus.  Host-side (scipy filtfilt at C speed) — run
anywhere: python scripts/bench_builder.py [n_wavs]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n_wavs: int = 500, seconds: float = 8.0, sr: int = 2000):
    from pcgmix_tpu.data.builder import BANDS, preprocess_wav
    from pcgmix_tpu.data.corpus import PHYSIONET_BANDS

    rng = np.random.default_rng(0)
    n = int(sr * seconds)
    wavs = rng.standard_normal((n_wavs, n)).astype(np.float32)

    t0 = time.time()
    total_bands = 0
    for y in wavs:
        for band in PHYSIONET_BANDS:
            x = preprocess_wav(y, sr, 1000, BANDS[band])
            total_bands += 1
    dt = time.time() - t0
    print(json.dumps({
        "n_wavs": n_wavs, "bands_per_wav": len(PHYSIONET_BANDS),
        "seconds_per_wav_audio": seconds,
        "wall_s": round(dt, 2),
        "wavs_per_sec": round(n_wavs / dt, 1),
        "band_filters_per_sec": round(total_bands / dt, 1),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
