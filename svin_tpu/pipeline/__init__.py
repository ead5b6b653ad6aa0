from .config import VioConfig, load_config
from .dataset import (
    SensorEvent,
    SyntheticRenderer,
    events_from_source,
    read_euroc_folder,
    run_events,
    sonar_range_from_intensity,
    synthetic_sequence,
)
from .vio import FrameResult, VioEngine

__all__ = [
    "FrameResult",
    "SensorEvent",
    "SyntheticRenderer",
    "VioConfig",
    "VioEngine",
    "load_config",
    "events_from_source",
    "read_euroc_folder",
    "sonar_range_from_intensity",
    "run_events",
    "synthetic_sequence",
]
