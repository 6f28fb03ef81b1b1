from graphtap_tpu.engine.program import VertexProgram
from graphtap_tpu.engine.executor import Executor

__all__ = ["VertexProgram", "Executor"]
