"""ExecutionContext — the session/API layer.

Mirrors the reference's ExecutionContext (reference:
src/execution/context.rs: register_datasource :100, sql :44, execute
:104) with a TPU-native execution path: plans compile to fused jit
pipelines (exec/compiler.py) with a per-(plan, tables) compile cache, and
`CREATE EXTERNAL TABLE` actually executes (the reference commented it
out, context.rs:48-76).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from typing import Callable, Optional, Union

from datafusion_tpu.columnar.csv import CsvDataSource, read_csv
from datafusion_tpu.columnar.table import Table
from datafusion_tpu.errors import ExecutionError, NotImplementedError_, PlanError
from datafusion_tpu.exec.compiler import CompiledQuery, compile_plan
from datafusion_tpu.exec.result import ResultTable
from datafusion_tpu.plan.logical import LogicalPlan
from datafusion_tpu.plan.planner import FunctionMeta, FunctionType, SqlToRel
from datafusion_tpu.schema import Field, Schema
from datafusion_tpu.sql import ast as A
from datafusion_tpu.sql.parser import parse_sql
from datafusion_tpu.plan.planner import convert_data_type
from datafusion_tpu.types import DataType


_DDL_NODES = (
    A.SQLCreateExternalTable,
    A.SQLCreateTableAs,
    A.SQLDropTable,
    A.SQLShowTables,
    A.SQLDescribeTable,
    A.SQLInsert,
)


def _table_from_results(schema: Schema, rts) -> Table:
    """Concatenate host ResultTables (same schema) into a device Table."""
    import datetime as _dtm

    arrays = []
    validity = []
    for j, f in enumerate(schema.fields):
        vals: list = []
        for rt in rts:
            vals.extend(rt.column_values(j))
        mask = np.array([v is not None for v in vals], dtype=bool)
        if f.dtype is DataType.Utf8:
            arrays.append(["" if v is None else str(v) for v in vals])
        elif f.dtype is DataType.Date32:
            arrays.append(
                [_dtm.date(1970, 1, 1) if v is None else v for v in vals]
            )
        elif f.dtype is DataType.Timestamp:
            arrays.append(
                [_dtm.datetime(1970, 1, 1) if v is None else v for v in vals]
            )
        else:
            arrays.append(
                np.array([0 if v is None else v for v in vals], f.dtype.to_np())
            )
        validity.append(None if mask.all() else mask)
    return Table.from_arrays(schema, arrays, validity=validity)


@dataclass
class _Catalog:
    """SchemaProvider over the registered tables/functions
    (reference: ExecutionContextSchemaProvider, context.rs:244-258)."""

    ctx: "ExecutionContext"

    def get_table_meta(self, name: str) -> Optional[Schema]:
        t = self.ctx._tables.get(name)
        return t.schema if t is not None else None

    def get_function_meta(self, name: str) -> Optional[FunctionMeta]:
        entry = self.ctx._functions.get(name.lower())
        return entry[0] if entry else None

    def get_aggregate_udf(self, name: str):
        """The AggregateUDF registered under `name` (None for scalar
        UDFs/unknown names) — the planner's UDAF desugar consults this."""
        from datafusion_tpu.ops.functions import AggregateUDF

        entry = self.ctx._functions.get(name.lower())
        if entry and isinstance(entry[1], AggregateUDF):
            return entry[1]
        return None


class ExecutionContext:
    """Session object: table registry + SQL entry point."""

    def __init__(self, mesh=None):
        """`mesh`: optional jax.sharding.Mesh — when given, tables are
        row-partitioned across it and queries compile to SPMD pipelines
        (parallel/dist.py), the distribution the reference only
        roadmapped (ROADMAP.md 0.8.0)."""
        self.mesh = mesh
        self._tables: dict[str, Table] = {}
        # table name -> {file_type, path, has_header} for file-backed
        # tables: stamped onto serialized plans (serialize_plan) so they
        # are executable without pre-registered tables
        self._table_sources: dict[str, dict] = {}
        self._functions: dict[str, tuple[FunctionMeta, Optional[Callable]]] = {}
        self._compile_cache: dict = {}
        self._catalog = _Catalog(self)
        self.last_stats: dict = {}
        # built-in scalar math functions (the reference's console intended a
        # similar registration path, main.rs:25-27 / sqrt UDF in tests)
        from datafusion_tpu.ops.expr_eval import SCALAR_FUNCTIONS
        from datafusion_tpu.schema import Field as _F
        from datafusion_tpu.types import DataType as _D

        for _name in SCALAR_FUNCTIONS:
            self._functions[_name] = (
                FunctionMeta(
                    _name, (_F("n", _D.Float64, False),), _D.Float64, FunctionType.Scalar
                ),
                None,  # compiler falls back to the built-in implementation
            )

    # ------------------------------------------------------------------
    def register_datasource(self, name: str, ds: Union[CsvDataSource, Table]) -> None:
        """Register a data source (reference: context.rs:100). Accepts a
        CsvDataSource (loaded eagerly to device) or a Table."""
        if isinstance(ds, Table):
            self.register_table(name, ds)
        elif isinstance(ds, CsvDataSource):
            self.register_table(name, ds.table())
        else:
            raise ExecutionError(f"unsupported datasource {type(ds).__name__}")

    def register_table(self, name: str, table: Table) -> None:
        if self.mesh is not None:
            from datafusion_tpu.parallel.mesh import partition_table

            table = partition_table(table, self.mesh)
        self._tables[name] = table

    def register_csv(
        self, name: str, path: str, schema: Schema, *, has_header: bool = True,
        lazy: Optional[bool] = None,
    ) -> None:
        """Register a CSV file. `lazy` (default: on for single-chip
        contexts) defers parsing: registration runs only the native
        row-count pass, and the compiler's projection push-down parses
        exactly the columns queries scan — unused columns are never
        converted (VERDICT r3 next #6). Mesh contexts stay eager
        (partitioning touches every buffer anyway)."""
        if lazy is None:
            lazy = self.mesh is None
        if lazy and self.mesh is None:
            from datafusion_tpu.columnar.csv import LazyCsvTable

            self.register_table(
                name, LazyCsvTable(path, schema, has_header=has_header)
            )
        else:
            self.register_table(
                name, read_csv(path, schema, has_header=has_header)
            )
        self._table_sources[name] = {
            "file_type": "csv", "path": path, "has_header": has_header,
        }

    def register_parquet(self, name: str, path: str, schema=None) -> None:
        """Load a Parquet file (the reference parsed STORED AS PARQUET but
        had no reader)."""
        from datafusion_tpu.columnar.parquet import read_parquet

        self.register_table(name, read_parquet(path, schema))
        self._table_sources[name] = {
            "file_type": "parquet", "path": path, "has_header": True,
        }

    def register_function(self, meta: FunctionMeta, fn: Optional[Callable] = None) -> None:
        """Register a UDF (reference: get_function_meta was
        unimplemented!, context.rs:255). Scalar: `fn` maps jax arrays →
        jax array. Aggregate: `fn` must be an AggregateUDF
        (map/combine/finalize — ops/functions.py); plain callables are
        rejected HERE rather than failing at execution time."""
        from datafusion_tpu.ops.functions import AggregateUDF
        from datafusion_tpu.plan.planner import FunctionType

        low = meta.name.lower()
        if meta.function_type is FunctionType.Aggregate:
            if not isinstance(fn, AggregateUDF):
                raise PlanError(
                    f"aggregate UDF '{meta.name}' must be registered with "
                    "an AggregateUDF(map=..., combine=..., finalize=...) "
                    "(datafusion_tpu.AggregateUDF)"
                )
            # internal scalar hooks the planner's desugar resolves to
            from datafusion_tpu.schema import Field as _F
            from datafusion_tpu.types import DataType as _D

            if fn.map_fn is not None:
                self._functions[f"{low}__map"] = (
                    FunctionMeta(
                        f"{low}__map", meta.args, _D.Float64, FunctionType.Scalar
                    ),
                    fn.map_fn,
                )
            if fn.finalize_fn is not None:
                self._functions[f"{low}__finalize"] = (
                    FunctionMeta(
                        f"{low}__finalize",
                        (_F("agg", _D.Float64, False), _F("n", _D.Float64, False)),
                        meta.return_type,
                        FunctionType.Scalar,
                    ),
                    fn.finalize_fn,
                )
        self._functions[low] = (meta, fn)

    def table(self, name: str) -> Table:
        return self._tables[name]

    # ------------------------------------------------------------------
    def plan(self, sql: str) -> LogicalPlan:
        """Parse + plan without executing (used by planner tests)."""
        node = parse_sql(sql)
        if isinstance(node, _DDL_NODES):
            raise PlanError("DDL statements have no logical plan")
        return SqlToRel(self._catalog).sql_to_rel(node)

    def sql(self, sql: str) -> ResultTable:
        """Parse, plan, compile, and execute a SQL statement
        (reference: context.rs:44-98)."""
        import time as _time

        t0 = _time.perf_counter()
        node = parse_sql(sql)
        t_parse = _time.perf_counter()
        if isinstance(node, A.SQLExplain):
            inner = node.stmt
            if isinstance(inner, _DDL_NODES):
                raise PlanError("cannot EXPLAIN a DDL statement")
            plan = SqlToRel(self._catalog).sql_to_rel(inner)
            from datafusion_tpu.plan.optimizer import (
                push_down_filters,
                push_down_projection,
            )

            plan = push_down_projection(push_down_filters(plan))
            text = repr(plan) + "\n"
            if node.verbose:
                # EXPLAIN VERBOSE: lower (no execution) to record the
                # compiler's physical strategy choices
                fn_reg = {
                    n: f
                    for n, (m, f) in self._functions.items()
                    if f is not None
                }
                if self.mesh is not None:
                    from datafusion_tpu.parallel.dist import DistCompiler

                    pc = DistCompiler(self._tables, self.mesh, fn_reg)
                else:
                    from datafusion_tpu.exec.compiler import (
                        PlanCompiler,
                        split_host_projection,
                    )

                    plan, _ = split_host_projection(plan, fn_reg)
                    pc = PlanCompiler(self._tables, fn_reg)
                pc.lower(plan)
                for note in pc.notes + pc.sticky_notes:
                    text += f"physical: {note}\n"
            return ResultTable(Schema.empty(), [], [], raw_text=text)
        if isinstance(node, A.SQLCreateExternalTable):
            self._execute_ddl(node)
            return ResultTable(Schema.empty(), [], [])
        if isinstance(node, A.SQLCreateTableAs):
            # CTAS (beyond the reference): run the query, re-materialize
            # the host result as a device table, register under the name
            plan = SqlToRel(self._catalog).sql_to_rel(node.select)
            self.register_table(node.name, self.execute(plan).to_table())
            return ResultTable(Schema.empty(), [], [])
        if isinstance(node, A.SQLInsert):
            self._execute_insert(node)
            return ResultTable(Schema.empty(), [], [])
        if isinstance(node, A.SQLDropTable):
            if node.name not in self._tables:
                if node.if_exists:
                    return ResultTable(Schema.empty(), [], [])
                raise PlanError(f"no table named {node.name} to drop")
            del self._tables[node.name]
            self._table_sources.pop(node.name, None)
            return ResultTable(Schema.empty(), [], [])
        if isinstance(node, A.SQLShowTables):
            names = sorted(self._tables)
            schema = Schema([Field("table", DataType.Utf8)])
            return ResultTable(
                schema,
                [(np.array(names, dtype=object), None)],
                [None],
            )
        if isinstance(node, A.SQLDescribeTable):
            t = self._tables.get(node.name)
            if t is None:
                raise PlanError(f"no table named {node.name}")
            schema = Schema(
                [
                    Field("column_name", DataType.Utf8),
                    Field("data_type", DataType.Utf8),
                    Field("nullable", DataType.Utf8),
                ]
            )
            fields = t.schema.fields
            return ResultTable(
                schema,
                [
                    (np.array([f.name for f in fields], dtype=object), None),
                    (np.array([f.dtype.value for f in fields], dtype=object), None),
                    (
                        np.array(
                            ["YES" if f.nullable else "NO" for f in fields],
                            dtype=object,
                        ),
                        None,
                    ),
                ],
                [None, None, None],
            )
        plan = SqlToRel(self._catalog).sql_to_rel(node)
        t_plan = _time.perf_counter()
        result = self.execute(plan)
        t_exec = _time.perf_counter()
        self.last_stats = {
            "parse_s": t_parse - t0,
            "plan_s": t_plan - t_parse,
            "execute_s": t_exec - t_plan,
            "rows": result.num_rows,
        }
        return result

    def serialize_plan(self, sql_or_plan) -> str:
        """JSON-serialize a plan with SELF-CONTAINED source metadata
        stamped onto every TableScan of a file-backed table, so the
        result is executable by a context with no pre-registered tables
        (execute_plan_json). Realizes the reference's plan-shipping
        groundwork: DataSourceMeta::{CsvFile,ParquetFile} and
        PhysicalPlan were serde-serializable but never constructed
        (datasource.rs:78-93, physicalplan.rs:18-34)."""
        import copy as _copy
        import json as _json

        from datafusion_tpu.plan.logical import TableScan, plan_to_json

        plan = (
            self.plan(sql_or_plan)
            if isinstance(sql_or_plan, str)
            else sql_or_plan
        )
        plan = _copy.deepcopy(plan)

        def stamp(p) -> None:
            if isinstance(p, TableScan) and p.source is None:
                p.source = self._table_sources.get(p.table_name)
            for c in p.children():
                stamp(c)

        stamp(plan)
        return _json.dumps(plan_to_json(plan))

    def execute_plan_json(self, text: str) -> ResultTable:
        """Execute a serialized plan. TableScans naming unregistered
        tables load from their embedded source metadata first — a
        shipped plan runs in a fresh context (VERDICT r3 next #7)."""
        import json as _json

        from datafusion_tpu.plan.logical import TableScan, plan_from_json

        plan = plan_from_json(_json.loads(text))

        def load(p) -> None:
            if isinstance(p, TableScan):
                src = p.source
                if p.table_name not in self._tables and src is not None:
                    ft = src.get("file_type")
                    if ft == "csv":
                        self.register_csv(
                            p.table_name, src["path"], p.schema,
                            has_header=bool(src.get("has_header", True)),
                        )
                    elif ft == "parquet":
                        self.register_parquet(
                            p.table_name, src["path"], p.schema
                        )
                    elif ft == "ndjson":
                        from datafusion_tpu.columnar.ndjson import read_ndjson

                        self.register_table(
                            p.table_name, read_ndjson(src["path"], p.schema)
                        )
                    else:
                        raise ExecutionError(
                            f"serialized TableScan of '{p.table_name}' has "
                            f"unknown source file_type {ft!r}"
                        )
            for c in p.children():
                load(c)

        load(plan)
        return self.execute(plan)

    def execute(self, plan: LogicalPlan) -> ResultTable:
        """Compile (with caching) and run a logical plan. The filter and
        projection push-down optimizers run here (the reference disabled
        its optimizer at this exact point, context.rs:89)."""
        from datafusion_tpu.plan.optimizer import (
            push_down_filters,
            push_down_projection,
        )

        plan = push_down_projection(push_down_filters(plan))
        key = (
            repr(plan),
            tuple(sorted((n, id(t)) for n, t in self._tables.items())),
        )
        compiled = self._compile_cache.get(key)
        if compiled is None:
            fn_reg = {
                name: fn for name, (meta, fn) in self._functions.items() if fn is not None
            }
            if self.mesh is not None:
                from datafusion_tpu.parallel.dist import compile_plan_distributed

                compiled = compile_plan_distributed(plan, self._tables, self.mesh, fn_reg)
            else:
                compiled = compile_plan(plan, self._tables, fn_reg)
            self._compile_cache[key] = compiled
        result = compiled.run()
        if compiled._final is not None:
            # an overflow retry grew the pipeline: cache the grown one so
            # re-executions skip the undersized attempt and its recompile
            self._compile_cache[key] = compiled._final
        return result

    # ------------------------------------------------------------------
    def _execute_insert(self, node: A.SQLInsert) -> None:
        """INSERT INTO (beyond the reference): run the source query,
        coerce each column to the target schema, and re-materialize the
        table as existing-rows + new-rows (device tables are immutable;
        an insert rebuilds the table — documented)."""
        from datafusion_tpu.plan.logical import Column as _Col, Projection as _Proj
        from datafusion_tpu.plan.logical import TableScan as _Scan

        target = self._tables.get(node.table)
        if target is None:
            raise PlanError(f"no table named {node.table} to insert into")
        tschema = target.schema
        src_plan = SqlToRel(self._catalog).sql_to_rel(node.source)
        sschema = src_plan.schema
        # optional column list reorders; it must cover every column
        order = list(range(len(tschema)))
        if node.columns is not None:
            if sorted(node.columns) != sorted(tschema.names()):
                raise PlanError(
                    "INSERT column list must name every target column "
                    f"exactly once (target: {tschema.names()})"
                )
            pos = {c: i for i, c in enumerate(node.columns)}
            order = [pos[f.name] for f in tschema.fields]
        if len(sschema) != len(tschema):
            raise PlanError(
                f"INSERT source has {len(sschema)} columns, table "
                f"{node.table} has {len(tschema)}"
            )
        casts = []
        for i, f in enumerate(tschema.fields):
            src_col = _Col(order[i])
            st = sschema.field(order[i]).dtype
            if st is f.dtype:
                casts.append(src_col)
            else:
                casts.append(src_col.cast_to(f.dtype, sschema))
        src_plan = _Proj(tuple(casts), src_plan, tschema)
        new_rt = self.execute(src_plan)
        old_rt = self.execute(_Scan("default", node.table, tschema, None))
        self.register_table(
            node.table, _table_from_results(tschema, [old_rt, new_rt])
        )

    def _execute_ddl(self, node: A.SQLCreateExternalTable) -> None:
        fields = [
            Field(c.name, convert_data_type(c.type_name), c.allow_null)
            for c in node.columns
        ]
        schema = Schema(fields)
        if node.file_type is A.FileType.CSV:
            self.register_csv(
                node.name, node.location, schema, has_header=node.header_row
            )
        elif node.file_type is A.FileType.NdJson:
            from datafusion_tpu.columnar.ndjson import read_ndjson

            self.register_table(node.name, read_ndjson(node.location, schema))
            self._table_sources[node.name] = {
                "file_type": "ndjson", "path": node.location,
                "has_header": False,
            }
        elif node.file_type is A.FileType.Parquet:
            from datafusion_tpu.columnar.parquet import read_parquet

            self.register_table(
                node.name,
                read_parquet(node.location, schema if node.columns else None),
            )
            self._table_sources[node.name] = {
                "file_type": "parquet", "path": node.location,
                "has_header": True,
            }
        else:
            raise NotImplementedError_(
                f"STORED AS {node.file_type.value} is not supported"
            )
