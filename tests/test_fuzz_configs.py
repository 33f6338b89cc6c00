"""Config-interaction fuzz: random valid ProcessingConfigs x random small
files through the FULL BatchProcessor, asserting completion and decodable,
finite output.  Catches feature-interaction breakage (routing x dither x
format x chain x reverb x layout) that single-feature tests can miss."""

import os

import numpy as np
import pytest

from f9tpu.config import ProcessingConfig
from f9tpu.io import read_wav, write_wav
from f9tpu.io.aiff import read_aiff
from f9tpu.pipeline import BatchProcessor


def _random_cfg(rng, out_dir):
    kw = dict(output_dir=out_dir, quality="low", batch_size=4,
              bucket_frames=(2048, 8192))
    kw["target_rate"] = int(rng.choice([44100, 48000, 32000, 44056]))
    kw["bits"] = int(rng.choice([16, 24, 32]))
    kw["dither"] = bool(rng.integers(2))
    kw["remove_dc"] = bool(rng.integers(2))
    kw["gain_db"] = float(rng.choice([0.0, -6.0, 3.0]))
    kw["seed"] = int(rng.integers(100))
    kw["output_format"] = str(rng.choice(["wav", "aiff"]))
    if kw["output_format"] == "aiff" and kw["bits"] == 32:
        kw["bits"] = 24
    kw["device_layout"] = str(rng.choice(["packed", "rows"]))
    if rng.integers(2):
        kw["reverb_mode"] = True
        kw["noise_floor_db"] = -90.0
    if rng.integers(3) == 0:
        from f9tpu.ops.chain import Chain, Gain, Saturator

        kw["chain"] = Chain(Gain(-1.5), Saturator("soft", 3.0, 0.7))
    if rng.integers(3) == 0:
        kw["output_channels"] = 2       # mono fan-out
    if rng.integers(3) == 0:
        kw["normalize_lufs"] = float(rng.choice([-14.0, -20.0, -24.0]))
        if rng.integers(2):
            kw["normalize_tp_db"] = -1.0
    return ProcessingConfig(**kw)


@pytest.mark.parametrize("trial", range(8))
def test_random_config_end_to_end(tmp_path, trial):
    rng = np.random.default_rng(1000 + trial)
    (tmp_path / "in").mkdir()
    paths = []
    n_files = int(rng.integers(2, 5))
    for i in range(n_files):
        ch = int(rng.choice([1, 2]))
        frames = int(rng.integers(500, 6000))
        x = (0.3 * rng.standard_normal((ch, frames))).astype(np.float32)
        if rng.integers(2):
            x += 0.05       # DC offset
        p = str(tmp_path / "in" / f"f{i}.wav")
        write_wav(p, x, 44100, bits=int(rng.choice([16, 24, 32])))
        paths.append(p)

    cfg = _random_cfg(rng, str(tmp_path / "out"))
    # mono fan-out requires consistent channel handling with routing etc.
    res = BatchProcessor(cfg).run(paths)
    assert res.failed == 0 and res.completed == n_files, (
        trial, cfg, res.failed)

    outs = [f for f in os.listdir(tmp_path / "out")
            if f.endswith((".wav", ".aiff"))]
    assert len(outs) == n_files
    reader = read_aiff if cfg.output_format == "aiff" else read_wav
    for f in outs:
        y, r = reader(str(tmp_path / "out" / f))
        assert r == cfg.target_rate
        assert np.isfinite(y).all()
        assert y.shape[1] > 0
