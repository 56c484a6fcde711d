"""Static-schedule compiler: DSL loop-nest IR -> wavefront schedule.

The reference never materializes the task DAG — it re-solves dependencies
analytically inside every post_op because program metadata must stay
O(program text) on stateless workers (numpywren/lambdapack.py + frontend.py).
On a fixed TPU mesh the schedule is known before the first kernel runs, so
this package inverts that: enumerate all statement instances once at compile
time, build the DAG, and emit wavefront levels that the executors turn into
SPMD steps.
"""

from numpywren_tpu.compiler.schedule import compile_schedule

__all__ = ["compile_schedule"]
