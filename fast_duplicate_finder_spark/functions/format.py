"""Report-edge formatting helpers (reference parity F6/F7).

The reference surfaces elapsed time as a Go ``time.Duration`` string
(status/status.go:72 ``time.Since(...).String()`` -> "1m32.5s") and the GUI
humanizes byte sizes; these are the driver-side equivalents used by the
text sink and the progress reporter. Pure functions, no Spark."""

from __future__ import annotations

_UNITS = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]


def humanize_bytes(n: int | float) -> str:
    """1536 -> '1.5 KiB' (base 1024, one decimal, exact bytes below 1 KiB)."""
    n = float(n)
    sign = "-" if n < 0 else ""
    n = abs(n)
    for unit in _UNITS[:-1]:
        if n < 1024:
            return (
                f"{sign}{int(n)} {unit}"
                if unit == "B"
                else f"{sign}{n:.1f} {unit}"
            )
        n /= 1024
    return f"{sign}{n:.1f} {_UNITS[-1]}"


def format_elapsed(seconds: float) -> str:
    """Go time.Duration.String() style: '1h2m3.5s', '4.2s', '350ms'."""
    if seconds < 0:
        return "-" + format_elapsed(-seconds)
    if seconds < 1:
        return f"{seconds * 1000:.0f}ms"
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    out = ""
    if h:
        out += f"{int(h)}h"
    if m or h:
        out += f"{int(m)}m"
    return out + f"{s:.1f}s"
