"""Environment-management CLI — SURVEY.md §2.11 C10.

Thin argparse front over `sources.catalog.EnvironmentCatalog`, mirroring
the reference's db_management subcommands (db_management.py:1186-1296:
create-db / create / delete / list / diff / sync).

    python -m financedatabase_spark.cli list-tables --base portfolio_data --env dev
    python -m financedatabase_spark.cli diff --bases portfolio_data --src prod --dst dev
    python -m financedatabase_spark.cli sync --bases portfolio_data --src prod --dst dev --apply
    python -m financedatabase_spark.cli delete --bases portfolio_data --env dev
"""

from __future__ import annotations

import argparse
import json
import sys

from financedatabase_spark.session import get_spark
from financedatabase_spark.sources.catalog import EnvironmentCatalog, resolve_environment


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="financedatabase_spark.cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--env", default=None, help="environment (default: detect)")

    sp = sub.add_parser("create-db", help="create an environment database (C3)")
    sp.add_argument("--base", required=True)
    common(sp)

    sp = sub.add_parser("list-tables", help="list tables of base@env (C8)")
    sp.add_argument("--base", required=True)
    common(sp)

    sp = sub.add_parser("clone", help="clone schema src->dst (C4)")
    sp.add_argument("--base", required=True)
    sp.add_argument("--src", required=True)
    sp.add_argument("--dst", required=True)
    sp.add_argument("--with-data", action="store_true")

    sp = sub.add_parser("diff", help="diff environments (C5)")
    sp.add_argument("--bases", nargs="+", required=True)
    sp.add_argument("--src", required=True)
    sp.add_argument("--dst", required=True)

    sp = sub.add_parser("sync", help="sync environments (C6; dry-run unless --apply)")
    sp.add_argument("--bases", nargs="+", required=True)
    sp.add_argument("--src", required=True)
    sp.add_argument("--dst", required=True)
    sp.add_argument("--apply", action="store_true")

    sp = sub.add_parser("delete", help="delete an environment (C7; guarded)")
    sp.add_argument("--bases", nargs="+", required=True)
    sp.add_argument("--env", required=True)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    cat = EnvironmentCatalog(get_spark("fdb-cli"))
    if args.cmd == "create-db":
        out = cat.create_environment_database(args.base, resolve_environment(args.env))
    elif args.cmd == "list-tables":
        out = cat.list_tables(args.base, resolve_environment(args.env))
    elif args.cmd == "clone":
        out = cat.clone_schema(args.base, args.src, args.dst, with_data=args.with_data)
    elif args.cmd == "diff":
        d = cat.diff_environments(args.bases, args.src, args.dst)
        out = {"missing_databases": d.missing_databases, "missing_tables": d.missing_tables,
               "in_sync": d.in_sync}
    elif args.cmd == "sync":
        d = cat.sync_environments(args.bases, args.src, args.dst, dry_run=not args.apply)
        out = {"applied": args.apply, "missing_databases": d.missing_databases,
               "missing_tables": d.missing_tables}
    elif args.cmd == "delete":
        out = cat.delete_environment(args.bases, args.env)
    else:  # pragma: no cover
        raise SystemExit(2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
