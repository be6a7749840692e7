"""Environment-aware catalog — SURVEY.md §2.11 C1–C8.

The reference resolves logical database names per environment through a
registry table `master_config.database_configs` (db_utils.py:94-164) and
manages environment lifecycle (create/clone/diff/sync/delete) with
mysqldump subprocesses (db_management.py). On Spark the physical layer is
the session catalog: environments are database namespaces
(``{base}_{env}``), the registry is a small DataFrame/table, and
clone/sync are CTAS loops — no subprocesses, no SQL-text rewriting.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: C7 guard — protected environments (reference: DB_PROTECTED_ENVIRONMENTS,
#: db_management.py:59-107).
PROTECTED_ENVIRONMENTS = ("prod",)

_IDENT = re.compile(r"^[a-zA-Z0-9_-]+$")


def validate_identifier(name: str) -> str:
    """F16 — identifier whitelist (reference: db_management.py:35-56)."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid identifier: {name!r}")
    return name


def resolve_environment(cli_env: str | None = None, branch: str | None = None) -> str:
    """C2 — environment detection: explicit arg > git branch (main→prod) >
    $ENVIRONMENT > 'prod' (reference: db_utils.py:73-91)."""
    if cli_env:
        return cli_env
    if branch:
        return "prod" if branch == "main" else branch
    return os.environ.get("ENVIRONMENT", "prod")


def resolve_database_name(
    base_name: str,
    environment: str,
    registry: DataFrame | None = None,
) -> str:
    """C1 — logical → physical database name.

    prod maps to the base name; `master_config` is never suffixed; other
    environments consult the registry (active rows), falling back to the
    ``{base}_{env}`` convention (reference: db_utils.py:94-164).
    """
    validate_identifier(base_name)
    validate_identifier(environment)
    if environment == "prod" or base_name == "master_config":
        return base_name
    if registry is not None:
        hit = (
            registry.filter(
                (F.col("base_name") == base_name)
                & (F.col("environment") == environment)
                & F.col("is_active")
            )
            .select("database_name")
            .limit(1)
            .collect()
        )
        if hit:
            return hit[0][0]
    return f"{base_name}_{environment}"


@dataclass
class EnvDiff:
    """C5 — diff between two environments (reference dataclass:
    db_management.py:169-184)."""

    missing_databases: list[str] = field(default_factory=list)
    missing_tables: dict[str, list[str]] = field(default_factory=dict)

    @property
    def in_sync(self) -> bool:
        return not self.missing_databases and not self.missing_tables


class EnvironmentCatalog:
    """C3–C8 over the Spark session catalog."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def _db(self, base: str, env: str) -> str:
        return resolve_database_name(base, env)

    def list_databases(self, env: str) -> list[str]:
        suffix = f"_{env}"
        return sorted(
            d.name
            for d in self.spark.catalog.listDatabases()
            if (env == "prod" and "_" not in d.name.replace("default", ""))
            or d.name.endswith(suffix)
        )

    def list_tables(self, base: str, env: str) -> list[str]:
        """C8 (reference: SQLHelpers.py:195-222 SHOW TABLES — base tables
        only, like the reference's information_schema BASE TABLE filter;
        session temp views are visible in every database and excluded)."""
        db = self._db(base, env)
        return sorted(
            t.name for t in self.spark.catalog.listTables(db) if not t.isTemporary
        )

    def table_schema(self, base: str, env: str, table: str) -> list[tuple[str, str]]:
        """C8/C9 introspection (reference: INFORMATION_SCHEMA.COLUMNS,
        SQLHelpers.py:506-540)."""
        cols = self.spark.catalog.listColumns(f"{self._db(base, env)}.{table}")
        return [(c.name, c.dataType) for c in cols]

    def create_environment_database(self, base: str, env: str) -> str:
        """C3 (reference: db_management.py:1068-1122)."""
        db = self._db(base, env)
        self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {validate_identifier(db)}")
        return db

    def clone_schema(self, base: str, src_env: str, dst_env: str, with_data: bool = False) -> list[str]:
        """C4 — per-table CTAS/LIKE loop replacing the reference's
        mysqldump pipeline (db_management.py:349-510)."""
        src_db, dst_db = self._db(base, src_env), self._db(base, dst_env)
        self.create_environment_database(base, dst_env)
        cloned = []
        for t in self.list_tables(base, src_env):
            if with_data:
                self.spark.sql(
                    f"CREATE TABLE IF NOT EXISTS {dst_db}.{t} AS SELECT * FROM {src_db}.{t}"
                )
            else:
                self.spark.sql(
                    f"CREATE TABLE IF NOT EXISTS {dst_db}.{t} LIKE {src_db}.{t}"
                )
            cloned.append(t)
        return cloned

    def diff_environments(self, bases: list[str], src_env: str, dst_env: str) -> EnvDiff:
        """C5 (reference: db_management.py:186-228)."""
        existing = {d.name for d in self.spark.catalog.listDatabases()}
        diff = EnvDiff()
        for base in bases:
            dst_db = self._db(base, dst_env)
            if dst_db not in existing:
                diff.missing_databases.append(dst_db)
                continue
            src_tables = set(self.list_tables(base, src_env))
            dst_tables = set(self.list_tables(base, dst_env))
            missing = sorted(src_tables - dst_tables)  # SET2 except
            if missing:
                diff.missing_tables[dst_db] = missing
        return diff

    def sync_environments(
        self, bases: list[str], src_env: str, dst_env: str, dry_run: bool = True
    ) -> EnvDiff:
        """C6 — create missing DBs and copy missing tables; dry-run default
        like the reference (db_management.py:771-981)."""
        diff = self.diff_environments(bases, src_env, dst_env)
        if dry_run:
            return diff
        for db in diff.missing_databases:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
        for base in bases:
            dst_db = self._db(base, dst_env)
            for t in diff.missing_tables.get(dst_db, []):
                self.spark.sql(
                    f"CREATE TABLE IF NOT EXISTS {dst_db}.{t} AS "
                    f"SELECT * FROM {self._db(base, src_env)}.{t}"
                )
        return diff

    def delete_environment(self, bases: list[str], env: str) -> list[str]:
        """C7 — drop all of an environment's databases; protected-env guard
        (reference: db_management.py:690-768)."""
        if env in PROTECTED_ENVIRONMENTS:
            raise PermissionError(f"environment {env!r} is protected")
        dropped = []
        for base in bases:
            db = self._db(base, env)
            self.spark.sql(f"DROP DATABASE IF EXISTS {validate_identifier(db)} CASCADE")
            dropped.append(db)
        return dropped
