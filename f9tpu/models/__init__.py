from .filters import CycleBank, design_cycle_bank, resolve_ratio, QUALITY_PRESETS  # noqa: F401
from .oracle import resample_oracle  # noqa: F401
