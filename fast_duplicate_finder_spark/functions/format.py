"""Report-edge formatting helpers (reference parity F6/F7).

The reference surfaces elapsed time as a Go ``time.Duration`` string
(status/status.go:72 ``time.Since(...).String()`` -> "1m32.5s") and the GUI
humanizes byte sizes; these are the driver-side equivalents used by the
text sink and the progress reporter. Pure functions, no Spark."""

from __future__ import annotations

_UNITS = ["B", "KiB", "MiB", "GiB", "TiB", "PiB"]


def humanize_bytes(n: int | float) -> str:
    """1536 -> '1.5 KiB' (base 1024, one decimal, exact bytes below 1 KiB).
    Rounds BEFORE unit selection so 1048575 is '1.0 MiB', never
    '1024.0 KiB' (the displayed value always stays < 1024)."""
    n = float(n)
    sign = "-" if n < 0 else ""
    n = abs(n)
    for unit in _UNITS[:-1]:
        if unit == "B":
            if n < 1024:
                return f"{sign}{int(n)} B"
        elif round(n, 1) < 1024:
            return f"{sign}{n:.1f} {unit}"
        n /= 1024
    return f"{sign}{n:.1f} {_UNITS[-1]}"


def format_elapsed(seconds: float) -> str:
    """Go time.Duration.String() style: '1h2m3.5s', '4.2s', '350ms'.
    Rounds once (ms below 1s, else deciseconds) BEFORE unit split so
    boundaries carry: 0.9996 -> '1.0s', 59.96 -> '1m0.0s'."""
    if seconds < 0:
        return "-" + format_elapsed(-seconds)
    ms = round(seconds * 1000)
    if ms < 1000:
        return f"{ms}ms"
    total_ds = round(seconds * 10)  # deciseconds, the displayed resolution
    mins, s_ds = divmod(total_ds, 600)
    h, m = divmod(mins, 60)
    out = ""
    if h:
        out += f"{h}h"
    if m or h:
        out += f"{m}m"
    return out + f"{s_ds / 10:.1f}s"
