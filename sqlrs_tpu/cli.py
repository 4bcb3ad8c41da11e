"""Interactive REPL.

Parity with the reference CLI (reference src/cli.rs:13-167): prompt loop with
history, `\\`-commands (\\load csv, \\dt, \\explain on/off), per-statement
wall-clock timing, and errors that abort only the current statement.

Run: python -m sqlrs_tpu.cli [--csv-dir DIR]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

from sqlrs_tpu.errors import SqlrsError
from sqlrs_tpu.session.database import Database
from sqlrs_tpu.utils.render import batch_to_rows, pretty_table

HISTORY_FILE = os.path.expanduser("~/.cache/sqlrs_tpu_history")
PROMPT = "sqlrs_tpu=# "

HELP = """\\q               quit
\\dt              list tables
\\load csv <path> [name]   load a csv file as a table
\\explain on|off  toggle plan printing before execution
\\?               this help"""


class Cli:
    def __init__(self, db: Database) -> None:
        self.db = db
        self.show_explain = False

    def run_command(self, line: str) -> bool:
        """Handle a backslash command; returns False to exit."""
        parts = line.split()
        cmd = parts[0]
        if cmd in ("\\q", "\\quit"):
            return False
        if cmd == "\\?":
            print(HELP)
        elif cmd == "\\dt":
            self.run_sql("show tables")
        elif cmd == "\\load" and len(parts) >= 3 and parts[1] == "csv":
            path = parts[2]
            name = parts[3] if len(parts) > 3 else os.path.splitext(
                os.path.basename(path)
            )[0]
            self.db.create_csv_table(name, path)
            print(f"loaded {path!r} as table {name}")
        elif cmd == "\\explain":
            self.show_explain = len(parts) > 1 and parts[1] == "on"
            print(f"explain {'on' if self.show_explain else 'off'}")
        else:
            print(f"unknown command {line!r}; \\? for help")
        return True

    def run_sql(self, sql: str) -> None:
        t0 = time.time()
        if self.show_explain and sql.strip().lower().startswith("select"):
            print(self.db.explain(sql))
        batches = self.db.run(sql)
        rows: list[list[str]] = []
        header: list[str] = []
        for b in batches:
            header = b.schema.names
            rows.extend(batch_to_rows(b))
        if header:
            print(pretty_table(header, rows))
        print(f"time consumed: {time.time() - t0:.4f}s")

    def interactive(self) -> None:
        try:
            import readline

            os.makedirs(os.path.dirname(HISTORY_FILE), exist_ok=True)
            if os.path.exists(HISTORY_FILE):
                readline.read_history_file(HISTORY_FILE)
        except Exception:
            readline = None
        print("sqlrs_tpu — TPU-native SQL engine. \\? for help, \\q to quit.")
        while True:
            try:
                line = input(PROMPT).strip()
            except (EOFError, KeyboardInterrupt):
                print()
                break
            if not line:
                continue
            if line.startswith("\\"):
                if not self.run_command(line):
                    break
                continue
            try:
                self.run_sql(line)
            except SqlrsError as e:
                print(f"error: {e}")
            except Exception as e:  # keep the REPL alive like the reference
                print(f"internal error: {type(e).__name__}: {e}")
        if readline is not None:
            try:
                readline.write_history_file(HISTORY_FILE)
            except Exception:
                pass


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="sqlrs_tpu REPL")
    ap.add_argument(
        "--csv-dir",
        help="preload every *.csv in DIR as a table named by file stem "
        "(the reference slt harness behavior)",
    )
    ap.add_argument("-c", "--command", help="run one SQL string and exit")
    ap.add_argument(
        "--devices",
        type=int,
        default=None,
        help="distributed session: row-shard tables over an N-device mesh",
    )
    args = ap.parse_args(argv)

    db = Database(n_devices=args.devices)
    if args.csv_dir:
        for p in sorted(glob.glob(os.path.join(args.csv_dir, "*.csv"))):
            db.create_csv_table(os.path.splitext(os.path.basename(p))[0], p)
            print(f"loaded table {os.path.splitext(os.path.basename(p))[0]}")
    cli = Cli(db)
    if args.command:
        try:
            cli.run_sql(args.command)
        except SqlrsError as e:
            print(f"error: {e}")
            sys.exit(1)
        return
    cli.interactive()


if __name__ == "__main__":
    main()
