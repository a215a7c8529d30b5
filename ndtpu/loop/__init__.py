from ndtpu.loop.closure import (LoopCandidates, LoopResult, detect_loops,
                                find_candidates, local_grid_config,
                                verify_candidates)

__all__ = ["LoopCandidates", "LoopResult", "detect_loops", "find_candidates",
           "local_grid_config", "verify_candidates"]
