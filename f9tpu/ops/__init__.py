from .resample import resample, resample_rates  # noqa: F401
