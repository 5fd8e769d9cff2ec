"""datafusion_tpu — a TPU-native vectorized SQL query engine.

A brand-new engine (not a port) with the capability set of early DataFusion
(reference: andygrove/datafusion-archive v0.6.0, surveyed in SURVEY.md):
SQL parsing/planning (projection, selection, CAST with supertype coercion,
MIN/MAX/SUM/COUNT/AVG aggregates with GROUP BY, ORDER BY, LIMIT, CREATE
EXTERNAL TABLE), executed as jit-compiled fused JAX/XLA pipelines over
HBM-resident columnar buffers — plus hash join, sort, and distributed
execution over a `jax.sharding.Mesh` that the reference only roadmapped.

Key design departures from the reference (see SURVEY.md §7):
  * columnar device Tables instead of streamed 1024-row RecordBatches
  * whole-plan lowering to traced XLA pipelines instead of per-expr closures
  * selection as masks, compaction only at materialization boundaries
  * strings dictionary-encoded (order-preserving codes) at host ingest
  * SPMD distribution via shard_map + XLA collectives over ICI
"""

import os as _os
import sys as _sys

# Whole-plan tracing nests query lowering inside pallas kernel traces;
# the combined Python call depth can exceed the default 1000-frame limit
# (observed as RecursionError mid-trace on the TPU backend).
_sys.setrecursionlimit(max(_sys.getrecursionlimit(), 20000))

# Float64 columns require x64 (parity with the reference's Arrow Float64
# arrays). Benches on real TPU hardware use f32 columns; set DFTPU_X64=0
# to leave jax's default 32-bit mode untouched.
if _os.environ.get("DFTPU_X64", "1") == "1":
    import jax as _jax

    _jax.config.update("jax_enable_x64", True)

# DFTPU_FORCE_CPU=1 pins the CPU backend before jax initializes — needed on
# machines whose sitecustomize pins a TPU platform at interpreter startup
# (plain JAX_PLATFORMS env is overridden there).
if _os.environ.get("DFTPU_FORCE_CPU", "0") == "1":
    import jax as _jax2

    try:
        _jax2.config.update("jax_platforms", "cpu")
    except Exception:
        pass

# Persistent XLA compilation cache: cold compiles through the remote
# AOT tunnel run minutes (CLAUDE.md), and every fresh process re-paid
# them. Caching compiled executables on disk makes bench/console restarts
# warm. DFTPU_COMPILE_CACHE=0 disables; harmless where the backend
# doesn't support serialization (jax falls back silently).
if _os.environ.get("DFTPU_COMPILE_CACHE", "1") == "1":
    import jax as _jax3

    try:
        _jax3.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get(
                "DFTPU_COMPILE_CACHE_DIR",
                _os.path.join(
                    _os.environ.get("XDG_CACHE_HOME")
                    or _os.path.join(_os.path.expanduser("~"), ".cache"),
                    "dftpu_xla",
                ),
            ),
        )
        _jax3.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

from datafusion_tpu.errors import (
    ExecutionError,
    InvalidColumnError,
    NotImplementedError_,
    ParserError,
    PlanError,
)
from datafusion_tpu.types import DataType, ScalarValue, get_supertype, can_coerce_from
from datafusion_tpu.schema import Field, Schema
from datafusion_tpu.plan.logical import Expr, LogicalPlan
from datafusion_tpu.columnar.table import Column, Table
from datafusion_tpu.columnar.csv import CsvDataSource, read_csv
from datafusion_tpu.exec.context import ExecutionContext
from datafusion_tpu.ops.functions import AggregateUDF, HostFunction
from datafusion_tpu.plan.planner import FunctionMeta, FunctionType

__version__ = "0.1.0"

__all__ = [
    "AggregateUDF",
    "CsvDataSource",
    "Column",
    "DataType",
    "ExecutionContext",
    "ExecutionError",
    "Expr",
    "Field",
    "FunctionMeta",
    "FunctionType",
    "HostFunction",
    "InvalidColumnError",
    "LogicalPlan",
    "NotImplementedError_",
    "ParserError",
    "PlanError",
    "ScalarValue",
    "Schema",
    "Table",
    "can_coerce_from",
    "get_supertype",
    "read_csv",
]
