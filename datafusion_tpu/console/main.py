"""Interactive SQL console.

Mirrors the reference's console binary (reference: src/bin/console/
main.rs + linereader.rs): an interactive REPL reading semicolon-
terminated, possibly multi-line statements (prompt switches while a
statement is open), `quit`/`exit` commands, and a `--script file.sql`
batch mode. Per-query wall timing is printed (the reference computed it
and dropped it, main.rs:133-148).

Run: python -m datafusion_tpu.console [--script FILE] [--mesh N]
"""

from __future__ import annotations

import argparse
import sys
import time

from datafusion_tpu.errors import ExecutionError
from datafusion_tpu.exec.context import ExecutionContext


class Console:
    def __init__(
        self,
        ctx: ExecutionContext | None = None,
        out=sys.stdout,
        ref_output: bool = False,
    ):
        """`ref_output`: emit the reference POC console's exact format —
        'Executing query ...' per statement, Display-rendered rows
        (strings unquoted), no timing line — so scripts diff cleanly
        against reference goldens (reference: test/data/
        smoketest-expected.txt, scripts/smoketest.sh:76-96)."""
        self.ctx = ctx or ExecutionContext()
        self.out = out
        self.ref_output = ref_output
        # the geospatial UDFs the reference console intended to register
        # (reference: main.rs:123-125, commented out)
        from datafusion_tpu.ops.functions import register_geospatial

        register_geospatial(self.ctx)

    def execute(self, sql: str) -> None:
        """Execute one statement, print results + timing
        (reference: Console::execute, main.rs:130-154)."""
        sql = sql.strip()
        if not sql:
            return
        if self.ref_output:
            print("Executing query ...", file=self.out)
        t0 = time.perf_counter()
        try:
            result = self.ctx.sql(sql)
        except ExecutionError as e:
            print(f"Error: {e}", file=self.out)
            return
        elapsed = time.perf_counter() - t0
        text = result.display_str() if self.ref_output else result.result_str()
        if text:
            self.out.write(text)
        if not self.ref_output:
            print(
                f"-- {result.num_rows} row(s) in {elapsed*1e3:.1f} ms",
                file=self.out,
            )

    # ------------------------------------------------------------------
    def run_script(self, path: str) -> None:
        """Batch mode: split the file on ';' (reference: main.rs:41-63)."""
        with open(path) as f:
            source = f.read()
        for stmt in source.split(";"):
            if stmt.strip():
                self.execute(stmt)

    def repl(self) -> None:
        """Multi-line reader: statements end with ';'; `quit`/`exit` leave
        (reference: linereader.rs:53-103)."""
        try:
            import readline  # noqa: F401  (history/editing)
        except ImportError:
            pass
        buf: list[str] = []
        while True:
            prompt = "datafusion-tpu> " if not buf else "             -> "
            try:
                line = input(prompt)
            except (EOFError, KeyboardInterrupt):
                print(file=self.out)
                return
            stripped = line.strip()
            if not buf and stripped.lower() in ("quit", "exit"):
                return
            buf.append(line)
            joined = "\n".join(buf)
            while ";" in joined:
                stmt, _, joined = joined.partition(";")
                self.execute(stmt)
            buf = [joined] if joined.strip() else []


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="datafusion-tpu console",
        description="TPU-native SQL engine console",
    )
    parser.add_argument("--script", help="execute a .sql script and exit")
    parser.add_argument(
        "--mesh",
        type=int,
        default=0,
        help="run distributed over an N-device mesh (0 = single device)",
    )
    parser.add_argument(
        "--profile",
        metavar="DIR",
        help="capture a jax.profiler trace of the session into DIR "
        "(inspect with tensorboard / xprof)",
    )
    parser.add_argument(
        "--ref-output",
        action="store_true",
        help="reference-console output format (banner, 'Executing query "
        "...' lines, Display-rendered rows, no timing) for golden diffs",
    )
    args = parser.parse_args(argv)

    if args.ref_output:
        print("DataFusion Console")  # reference: main.rs:86

    mesh = None
    if args.mesh:
        from datafusion_tpu.parallel.mesh import make_mesh

        import jax

        mesh = make_mesh(jax.devices()[: args.mesh])
    console = Console(ExecutionContext(mesh=mesh), ref_output=args.ref_output)
    profile_cm = None
    if args.profile:
        import jax

        profile_cm = jax.profiler.trace(args.profile)
        profile_cm.__enter__()
    try:
        if args.script:
            console.run_script(args.script)
        else:
            console.repl()
    finally:
        if profile_cm is not None:
            profile_cm.__exit__(None, None, None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
