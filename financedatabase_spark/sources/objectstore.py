"""Object-store single-writer lease — the 100 TB deployment half of the
`TableLease` protocol (operators/io_sinks.py).

`DirectoryLease` covers local/NFS paths with an atomic ``mkdir``. Object
stores have no atomic namespace operation, but every major one exposes
CONDITIONAL WRITES, and that is the public primitive this module builds
on:

- S3 ``PutObject`` honors ``If-None-Match: *`` (create-only, 412 on
  conflict; generally available since 2024) and ``If-Match: <etag>``
  (replace-only-if-unchanged), plus the same preconditions on
  ``DeleteObject``;
- GCS has ``x-goog-if-generation-match: 0`` (create-only) and
  ``=<generation>`` (CAS replace / delete);
- Azure Blob has the standard HTTP ``If-None-Match: *`` / ``If-Match``.

`ConditionalPutLease` maps the lease contract onto exactly three such
calls — create-if-absent, replace-if-etag-matches (the stale takeover;
one breaker's CAS wins, every other racer gets 412 and retries — and
`renew`, the heartbeat that re-stamps a long hold at its own etag), and
delete-if-etag-matches (release; a 412 means the lease was already
broken, which the `TableLease` contract defines as a non-error). The
store specifics live behind the tiny `ObjectStoreClient` protocol; the
S3 production adapter is SHIPPED (`sources/objectstore_s3.py` — boto3
IfNoneMatch/IfMatch parameters, 412/409/404 mapping, the full lease
conformance suite run against a botocore-shaped fake). Tests also run
the same lease logic against `FileObjectStore`, a local mock whose
operations are made atomic ACROSS PROCESSES with an ``fcntl.flock``
around each conditional op — the mock stands in for the store's
server-side atomicity, not for its API shape.

Reference parity: the reference relies on InnoDB transactions for
single-writer rewrites (SQLHelpers.py:651-686); on a lakehouse the
equivalent guarantee is this conditional-put mutex (the same primitive
Delta's S3 LogStore and Iceberg's commit protocols use).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Protocol

from financedatabase_spark.operators.io_sinks import ConcurrentWriteError


class PreconditionFailedError(RuntimeError):
    """The conditional write's precondition did not hold (HTTP 412)."""


class ObjectStoreClient(Protocol):
    """The three conditional primitives the lease needs. ``put`` with
    ``if_none_match=True`` must succeed only when the key is ABSENT;
    with ``if_match`` only when the stored etag equals it; both raise
    `PreconditionFailedError` otherwise and return the new etag.
    ``get`` returns ``(body, etag)`` or None when absent. ``delete``
    with ``if_match`` removes the object only at that etag (absent key:
    no-op)."""

    def put(
        self, key: str, body: bytes, *, if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str: ...

    def get(self, key: str) -> tuple[bytes, str] | None: ...

    def delete(self, key: str, *, if_match: str | None = None) -> None: ...


class ConditionalPutLease:
    """`TableLease` over an `ObjectStoreClient` — mutual exclusion per
    table key, stale-lease takeover via compare-and-swap.

    acquire: create-only put of ``<prefix>/<lock_name>`` carrying
    {owner, ts}. On conflict, read the holder: fresh → raise
    `ConcurrentWriteError`; stale (older than ``stale_after``) →
    CAS-replace at the READ etag — the store lets exactly one racing
    breaker through (everyone else gets 412 and retries against the
    winner's fresh lease), the same single-winner shape as
    `DirectoryLease`'s rename tombstone. The token is (key, etag), so
    release only ever deletes the lease THIS writer owns: a
    conditional delete at the token's etag, where 412 means someone
    legitimately broke and re-took the lease — swallowed per the
    `TableLease` contract."""

    def __init__(
        self, client: ObjectStoreClient, table_key: str, lock_name: str = "_LOCK.json"
    ) -> None:
        self.client = client
        self.key = table_key.rstrip("/") + "/" + lock_name
        self._owner = f"{os.getpid()}-{uuid.uuid4().hex[:8]}"

    def _body(self) -> bytes:
        return json.dumps({"owner": self._owner, "ts": time.time()}).encode()

    def acquire(self, stale_after: float = 3600.0, _attempts: int = 8) -> tuple[str, str]:
        if _attempts <= 0:
            raise ConcurrentWriteError(
                f"rewrite lease on {self.key}: acquire retries exhausted "
                f"(persistent contention or clock skew)"
            )
        try:
            etag = self.client.put(self.key, self._body(), if_none_match=True)
            return (self.key, etag)
        except PreconditionFailedError:
            pass
        cur = self.client.get(self.key)
        if cur is None:  # holder released between put and get: retry
            return self.acquire(stale_after, _attempts - 1)
        body, etag = cur
        try:
            ts = float(json.loads(body)["ts"])
        except (ValueError, KeyError, TypeError):
            ts = 0.0  # unparseable lease = treat as infinitely stale
        age = time.time() - ts
        if age > stale_after:
            try:  # CAS takeover: exactly one breaker wins at this etag
                new_etag = self.client.put(self.key, self._body(), if_match=etag)
                return (self.key, new_etag)
            except PreconditionFailedError:
                # another writer broke (or the holder refreshed) first
                return self.acquire(stale_after, _attempts - 1)
        raise ConcurrentWriteError(
            f"rewrite lease on {self.key} held by another writer (age {age:.0f}s)"
        )

    def renew(self, token: object) -> tuple[str, str]:
        """Heartbeat for holds that may outlive ``stale_after``: CAS-
        replace the lease AT THE TOKEN'S ETAG with a fresh timestamp.
        The conditional put makes this exactly as safe as acquire —
        either this writer still holds the lease (the etag matches, the
        store re-stamps it, a NEW token comes back) or someone broke and
        re-took it (412), in which case exclusivity is GONE and the only
        correct move is to abort the rewrite: raises
        `ConcurrentWriteError`. Renew at stale_after/4 or faster; see
        `TableLease` max-hold contract."""
        key, etag = token  # type: ignore[misc]
        try:
            new_etag = self.client.put(key, self._body(), if_match=etag)
        except PreconditionFailedError:
            # A renew whose conditional PUT landed server-side but lost
            # its RESPONSE leaves the held token's etag one generation
            # behind: the next beat 412s even though exclusivity was
            # never lost. Disambiguate by reading the lease back — if
            # the stored owner is still this writer, the mismatched
            # etag was our own successful write, so adopt the current
            # etag and keep the hold (a breaker arriving after this GET
            # still loses: our next CAS at the adopted etag 412s with
            # THEIR owner and aborts). Any other owner, or a vanished
            # lease, means it was genuinely broken and re-taken.
            cur = self.client.get(key)
            if cur is not None:
                body, cur_etag = cur
                try:
                    owner = json.loads(body).get("owner")
                except (ValueError, TypeError, AttributeError):
                    owner = None
                if owner == self._owner:
                    return (key, cur_etag)
            raise ConcurrentWriteError(
                f"rewrite lease on {key} was broken by another writer during "
                f"the hold — abort, do not publish"
            ) from None
        return (key, new_etag)

    def release(self, token: object) -> None:
        key, etag = token  # type: ignore[misc]
        try:
            self.client.delete(key, if_match=etag)
        except PreconditionFailedError:
            pass  # lease was broken and re-taken: theirs now, not ours


class FileObjectStore:
    """Local `ObjectStoreClient` mock: one file per key under ``root``
    plus an etag sidecar, every conditional op serialized by an
    ``fcntl.flock`` on a store-level lockfile so the
    check-condition-then-write pair is atomic across PROCESSES — the
    mock supplies the atomicity a real store implements server-side.
    Suitable for tests and single-host dev, NOT a production store."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _paths(self, key: str) -> tuple[str, str]:
        safe = key.replace("/", "%2F")
        return os.path.join(self.root, safe), os.path.join(self.root, safe + ".etag")

    def _locked(self):
        import fcntl
        from contextlib import contextmanager

        @contextmanager
        def guard():
            fd = os.open(os.path.join(self.root, ".storelock"), os.O_CREAT | os.O_RDWR)
            try:
                fcntl.flock(fd, fcntl.LOCK_EX)
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
                os.close(fd)

        return guard()

    def put(
        self, key: str, body: bytes, *, if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        if if_none_match and if_match is not None:
            raise ValueError("if_none_match and if_match are mutually exclusive")
        data, tag = self._paths(key)
        with self._locked():
            exists = os.path.exists(data)
            if if_none_match and exists:
                raise PreconditionFailedError(f"{key}: already exists")
            if if_match is not None:
                if not exists:
                    raise PreconditionFailedError(f"{key}: absent, expected {if_match}")
                with open(tag) as fh:
                    if fh.read() != if_match:
                        raise PreconditionFailedError(f"{key}: etag changed")
            etag = uuid.uuid4().hex
            with open(data, "wb") as fh:
                fh.write(body)
            with open(tag, "w") as fh:
                fh.write(etag)
            return etag

    def get(self, key: str) -> tuple[bytes, str] | None:
        data, tag = self._paths(key)
        with self._locked():
            if not os.path.exists(data):
                return None
            with open(data, "rb") as fh:
                body = fh.read()
            with open(tag) as fh:
                return body, fh.read()

    def delete(self, key: str, *, if_match: str | None = None) -> None:
        data, tag = self._paths(key)
        with self._locked():
            if not os.path.exists(data):
                return  # deleting an absent key is a no-op, like S3
            if if_match is not None:
                with open(tag) as fh:
                    if fh.read() != if_match:
                        raise PreconditionFailedError(f"{key}: etag changed")
            os.remove(data)
            os.remove(tag)


class InMemoryObjectStore:
    """Dict-backed `ObjectStoreClient` for single-process tests — same
    conditional semantics as `FileObjectStore` behind a thread lock."""

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self._objs: dict[str, tuple[bytes, str]] = {}

    def put(
        self, key: str, body: bytes, *, if_none_match: bool = False,
        if_match: str | None = None,
    ) -> str:
        if if_none_match and if_match is not None:
            raise ValueError("if_none_match and if_match are mutually exclusive")
        with self._lock:
            cur = self._objs.get(key)
            if if_none_match and cur is not None:
                raise PreconditionFailedError(f"{key}: already exists")
            if if_match is not None and (cur is None or cur[1] != if_match):
                raise PreconditionFailedError(f"{key}: etag changed or absent")
            etag = uuid.uuid4().hex
            self._objs[key] = (bytes(body), etag)
            return etag

    def get(self, key: str) -> tuple[bytes, str] | None:
        with self._lock:
            return self._objs.get(key)

    def delete(self, key: str, *, if_match: str | None = None) -> None:
        with self._lock:
            cur = self._objs.get(key)
            if cur is None:
                return
            if if_match is not None and cur[1] != if_match:
                raise PreconditionFailedError(f"{key}: etag changed")
            del self._objs[key]
