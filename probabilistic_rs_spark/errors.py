"""Exception hierarchy, mirroring the reference's error enums.

Reference: ``src/bloom/error.rs:5-34`` (BloomError: IndexOutOfBounds,
InvalidConfig, StorageError, SerializationError, ConfigNotFound,
SnapshotNotFound, ...) and ``src/ebloom/error.rs:8-33``. Driver-side
validation raises these *before* a Spark job launches wherever possible.
"""

from __future__ import annotations


class SketchError(Exception):
    """Base class for all sketch-library errors."""


class SketchConfigError(SketchError, ValueError):
    """Invalid configuration (reference: BloomError::InvalidConfig)."""


class SketchStateError(SketchError):
    """Corrupt / incompatible serialized state
    (reference: BloomError::SerializationError)."""


class SketchStorageError(SketchError):
    """Checkpoint/persistence failure (reference: BloomError::StorageError)."""


class ConfigNotFoundError(SketchStorageError):
    """Resume attempted but no persisted config exists
    (reference: BloomError::ConfigNotFound, src/bloom/error.rs:25-26)."""


class SnapshotNotFoundError(SketchStorageError):
    """Resume attempted but no snapshot exists
    (reference: BloomError::SnapshotNotFound)."""
