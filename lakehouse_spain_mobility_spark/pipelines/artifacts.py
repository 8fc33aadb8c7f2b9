"""Injectable artifact store: where report files go after they are written.

The reference uploads every report artifact to S3 with boto3
(``dags/mitma/generate_report.py:67-88`` — bucket + key prefix, one
``upload_file`` per artifact). This sandbox has no network, so the store is
an interface: the pipelines write locally and hand paths to a store; the
default store files them under a root directory with the same key layout an
S3 bucket would use, and the S3-shaped store carries the boto3 calling
convention behind an import gate (constructor injection keeps it testable
without the dependency).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Protocol


class ArtifactStore(Protocol):
    def put(self, local_path: str, key: str) -> str:
        """Store the file under ``key``; return the store URI."""
        ...


class LocalArtifactStore:
    """Key-addressed directory tree — the S3 layout on local disk."""

    def __init__(self, root: str) -> None:
        self.root = root

    def put(self, local_path: str, key: str) -> str:
        dest = os.path.join(self.root, key)
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        shutil.copyfile(local_path, dest)
        return f"file://{dest}"

    def get_bytes(self, key: str) -> bytes:
        with open(os.path.join(self.root, key), "rb") as f:
            return f.read()


class S3ArtifactStore:
    """boto3-shaped store (dags/mitma/generate_report.py:67-88): inject a
    client factory so environments without boto3/network fail at use, not
    import — and tests can inject a fake client."""

    def __init__(self, bucket: str, prefix: str = "reports/",
                 client_factory: Callable[[], object] | None = None) -> None:
        self.bucket = bucket
        self.prefix = prefix
        self._client_factory = client_factory or self._default_factory

    @staticmethod
    def _default_factory():
        try:
            import boto3  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - boto3 absent here
            raise RuntimeError(
                "S3ArtifactStore needs boto3 (or an injected client_factory)"
            ) from e
        return boto3.client("s3")  # pragma: no cover

    def put(self, local_path: str, key: str) -> str:
        full_key = f"{self.prefix}{key}"
        self._client_factory().upload_file(local_path, self.bucket, full_key)
        return f"s3://{self.bucket}/{full_key}"
