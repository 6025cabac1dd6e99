"""Scheduler shim — cron-batch orchestration (SURVEY §3 EP3).

The reference wraps the batch run in a Prefect flow deployed on cron
(reference: etl_agent/operator.py:4-16; plan-level ``schedule.cron``,
plan.yaml:46-47).  Prefect isn't part of this environment; the same
contract is provided two ways:

1. ``run_once(plan_text)`` — the unit any external scheduler (cron,
   Airflow, Prefect, k8s CronJob) invokes, e.g.
   ``* * * * * python -m agentic_etl_poc_spark.cli -p plan.yaml``.
2. ``run_forever(plan_text, interval_seconds)`` — a minimal in-process
   ticker for tests/demos; each tick is an independent batch run
   ("streaming by rescheduling", which Structured Streaming's
   ``Trigger.AvailableNow`` subsumes — see streaming module).
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import SparkSession


def run_once(spark: SparkSession, plan_text: str) -> dict:
    from agentic_etl_poc_spark.runtime import run_prompt

    return run_prompt(spark, plan_text)


def run_forever(
    spark: SparkSession,
    plan_text: str,
    interval_seconds: float = 3600.0,
    max_ticks: int | None = None,
    on_result: Callable[[dict], None] | None = None,
) -> list[dict]:
    results = []
    tick = 0
    while max_ticks is None or tick < max_ticks:
        result = run_once(spark, plan_text)
        results.append(result)
        if on_result:
            on_result(result)
        tick += 1
        if max_ticks is not None and tick >= max_ticks:
            break
        time.sleep(interval_seconds)
    return results
