"""Plan optimizer.

The HEP rule engine (reference src/optimizer/heuristic/) lands here; until
the rule batches are in, `optimize` is identity — plans produced by the
binder are already executable, the optimizer only improves them.
"""

from sqlrs_tpu.plan.logical import LogicalOperator


def optimize(plan: LogicalOperator) -> LogicalOperator:
    try:
        from sqlrs_tpu.optimizer.hep import default_optimizer

        return default_optimizer().find_best(plan)
    except ImportError:
        return plan
