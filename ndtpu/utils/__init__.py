from ndtpu.utils.checkpoint import (CheckpointManager, restore_state,
                                    save_state)
from ndtpu.utils.metrics import (JsonlLogger, map_to_ascii, summarize_run,
                                 timer, trace)

__all__ = ["CheckpointManager", "restore_state", "save_state",
           "JsonlLogger", "map_to_ascii", "summarize_run", "timer", "trace"]
