from graphtap_tpu.tools.oracle import state_stats
from graphtap_tpu.tools.timing import PhaseTimer

__all__ = ["state_stats", "PhaseTimer"]
