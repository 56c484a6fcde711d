"""Runtime: program object, node state machine, and executors.

Rebuild of the reference's L4/L7 (numpywren/lambdapack.py ::
LambdaPackProgram + NS/PS enums; numpywren/job_runner.py :: lambdapack_run).
The dynamic, queue-driven execution model is kept in-process (LocalExecutor:
threads = Lambda workers, queue.PriorityQueue = SQS, the program's state
arrays + lock = Redis CAS) because it is the semantics against which the
static TPU executors are validated, and it is what the fault-injection tests
exercise. The TPU path (JaxTaskExecutor / fused lowering) runs the same
compiled DAG as wavefront SPMD steps with no queue at all.
"""

from numpywren_tpu.runtime.program import NS, PS, TiledProgram
from numpywren_tpu.runtime.executor import (
    JaxTaskExecutor,
    LocalExecutor,
    SpillTaskExecutor,
    run_program,
)
from numpywren_tpu.runtime.spill import out_of_core_cholesky

__all__ = [
    "NS", "PS", "TiledProgram", "LocalExecutor", "JaxTaskExecutor",
    "SpillTaskExecutor", "out_of_core_cholesky", "run_program",
]
