"""Benchmark: audio-minutes resampled per second per chip (44.1->48 kHz stereo).

Headline = the fused device graph (SRC + tail windows + DC removal + TPDF
dither + 24-bit quantize) on resident data — the replacement for the
reference's ~1.06x-real-time hardware loop (BASELINE.md).  Baseline target:
1000x real time per chip = 16.667 audio-min/s.  Accuracy: RMS error of the
emitted 24-bit codes vs the float64 oracle (the JUCE-oracle role,
BASELINE.json).

Timing uses `f9tpu.utils.benchtime.measure_op`: this environment reaches the
TPU through a tunnel whose block_until_ready resolves early and whose
dispatch pays a large round trip, so the op is repeated inside one jitted
fori_loop (iteration-perturbed input, full-output probe) and timed by the
n=1 vs n=N slope.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "audio-min/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main() -> None:
    from f9tpu.config import ProcessingConfig
    from f9tpu.models.oracle import resample_oracle
    from f9tpu.pipeline.graph import _cfg_key, _process_impl_rows
    from f9tpu.utils.benchtime import measure_op

    dev = jax.devices()[0]
    print(f"bench device: {dev}", file=sys.stderr)

    rate_in, rate_out = 44100, 48000
    files, channels, frames = 16, 2, 1 << 20     # ~23.8 s per file
    cfg = ProcessingConfig(output_dir="/tmp/bench_out", target_rate=rate_out,
                           quality="high")
    cfg_key = _cfg_key(cfg, 0)
    valid = jnp.full((files,), frames, jnp.int32)
    key = jax.random.PRNGKey(0)

    def step(x):
        # the production fast path: rows layout (host flattens after D2H)
        return _process_impl_rows(
            x, valid, key, rate_in=rate_in, rate_out=rate_out, cfg_key=cfg_key,
        )

    x = jax.random.normal(key, (files, channels, frames), jnp.float32) * 0.25

    t0 = time.time()
    wall = measure_op(step, x, n=8, repeats=2)
    print(f"measurement took {time.time()-t0:.1f}s total", file=sys.stderr)

    audio_seconds = files * frames / rate_in
    x_rt = audio_seconds / wall
    audio_min_per_s = x_rt / 60.0
    print(f"device step: {wall*1000:.2f} ms for {audio_seconds:.1f} s audio "
          f"-> {x_rt:.0f}x real time", file=sys.stderr)

    # ---- accuracy vs float64 oracle (same graph, dither off for comparison) ----
    acc_cfg = ProcessingConfig(output_dir="/tmp/bench_out", target_rate=rate_out,
                               quality="high", dither=False, remove_dc=False)
    rng = np.random.default_rng(0)
    n_acc = 1 << 15
    # headroom matters: resampling white noise overshoots its sample peaks
    # (Gibbs), and the 24-bit quantizer clips at full scale — keep peaks ~0.5
    xa_h = (0.125 * rng.standard_normal((1, 1, n_acc))).astype(np.float32)
    res = _process_impl_rows(
        jax.device_put(jnp.asarray(xa_h), dev),
        jnp.full((1,), n_acc, jnp.int32),
        jax.random.PRNGKey(1),
        rate_in=rate_in, rate_out=rate_out, cfg_key=_cfg_key(acc_cfg, 0),
    )
    codes, out_frames = np.asarray(res[0]), int(np.asarray(res[1])[0])
    codes = codes.reshape(1, codes.shape[1], -1)   # host flatten (free)
    got = codes[0, 0, :out_frames].astype(np.float64) / (1 << 23)
    ref = resample_oracle(xa_h[0, 0], rate_in, rate_out, quality="high")
    err = got - ref[:out_frames]
    rms_db = 20 * np.log10(np.sqrt((err**2).mean())
                           / np.sqrt((ref**2).mean()) + 1e-30)
    print(f"accuracy (24-bit codes vs float64 oracle): {rms_db:.1f} dB RMS",
          file=sys.stderr)

    baseline_x_rt = 1000.0  # north-star: 1000x real time per chip
    print(json.dumps({
        "metric": "audio-minutes resampled/sec/chip (44.1->48k stereo)",
        "value": round(audio_min_per_s, 3),
        "unit": "audio-min/s",
        "vs_baseline": round(x_rt / baseline_x_rt, 3),
        "x_realtime": round(x_rt, 1),
        "accuracy_rms_db_vs_oracle": round(float(rms_db), 1),
        "device": str(dev),
    }))


if __name__ == "__main__":
    main()
