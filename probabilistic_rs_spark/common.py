"""Human-readable size helpers — behavioral parity with the reference's
``src/common.rs:4-27`` (``bytes2hr`` prints integer bytes below 1 KiB;
``bits2hr`` always prints two decimals, including the bytes range)."""

from __future__ import annotations

_KB = 1024.0
_MB = 1024.0 * 1024.0
_GB = 1024.0 * 1024.0 * 1024.0


def bytes2hr(n_bytes: int) -> str:
    if n_bytes < 1024:
        return f"{n_bytes} bytes"
    if n_bytes < 1024 * 1024:
        return f"{n_bytes / _KB:.2f} KB"
    if n_bytes < 1024 * 1024 * 1024:
        return f"{n_bytes / _MB:.2f} MB"
    return f"{n_bytes / _GB:.2f} GB"


def bits2hr(n_bits: int) -> str:
    b = n_bits / 8.0
    if b < _KB:
        return f"{b:.2f} bytes"
    if b < _MB:
        return f"{b / _KB:.2f} KB"
    if b < _GB:
        return f"{b / _MB:.2f} MB"
    return f"{b / _GB:.2f} GB"
