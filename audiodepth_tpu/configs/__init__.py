from .config import (
    Config,
    DatasetConfig,
    ModeConfig,
    ModelConfig,
    DATASET_PRESETS,
    MODE_PRESETS,
    MODEL_PRESETS,
    apply_overrides,
    experiment_name,
    load_config,
    to_dict,
    validate,
)

__all__ = [
    "Config",
    "DatasetConfig",
    "ModeConfig",
    "ModelConfig",
    "DATASET_PRESETS",
    "MODE_PRESETS",
    "MODEL_PRESETS",
    "apply_overrides",
    "experiment_name",
    "load_config",
    "to_dict",
    "validate",
]
