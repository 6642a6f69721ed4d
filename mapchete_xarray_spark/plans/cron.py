"""Pure-Python 5-field cron expansion (croniter stand-in).

The reference expands its output time axis with croniter over any
crontab pattern (``/root/reference/mapchete_xarray/_output.py:641-649``);
croniter isn't installed in this sandbox, so this module implements
the public crontab(5) grammar from scratch:

    field := '*' | expr (',' expr)*
    expr  := value | value '-' value | ( '*' | value | value '-' value ) '/' step

Fields: minute (0-59), hour (0-23), day-of-month (1-31),
month (1-12), day-of-week (0-7, both 0 and 7 = Sunday).
Month and day-of-week values may be three-letter names (jan-dec,
sun-sat, case-insensitive), including in ranges ('mon-fri').
``@yearly/@annually/@monthly/@weekly/@daily/@midnight/@hourly``
macros expand to their standard 5-field forms.

Semantics match croniter (the library the reference actually calls):
- steps apply to the full range for '*', to the given range for
  'a-b/n', and to 'value..max' for a bare 'v/n' (vixie: "a range of
  numbers can be followed by /step; a bare number with a step means
  number-max/step"),
- descending ranges ('22-2' hours, 'fri-sun' dow) wrap through the
  field maximum, as croniter/cronie accept,
- when BOTH day-of-month and day-of-week are restricted (neither is
  the literal '*'), a date matches if EITHER matches (the OR rule).
  NOTE one deliberate croniter-over-vixie choice: a '*/n' day field
  counts as RESTRICTED here (so '0 0 */2 * 1' fires on every-2nd-day
  OR Mondays, like croniter); vixie-cron sets its star flag for any
  field starting with '*' and would AND them.  The parity tests are
  croniter goldens, so this is the contract the axis keeps.

Expansion iterates calendar days (not minutes), so a multi-year daily
axis costs O(days), and emits datetimes in ascending order,
inclusive of both endpoints.
"""

from __future__ import annotations

import datetime as dt
from typing import Iterator

_BOUNDS = {
    "minute": (0, 59),
    "hour": (0, 23),
    "dom": (1, 31),
    "month": (1, 12),
    "dow": (0, 7),
}

# three-letter name aliases, crontab(5) / croniter parity
_NAMES = {
    "month": {
        n: i + 1
        for i, n in enumerate(
            "jan feb mar apr may jun jul aug sep oct nov dec".split()
        )
    },
    "dow": {n: i for i, n in enumerate("sun mon tue wed thu fri sat".split())},
}

# @-macros, vixie-cron / croniter parity
MACROS = {
    "@yearly": "0 0 1 1 *",
    "@annually": "0 0 1 1 *",
    "@monthly": "0 0 1 * *",
    "@weekly": "0 0 * * 0",
    "@daily": "0 0 * * *",
    "@midnight": "0 0 * * *",
    "@hourly": "0 * * * *",
}


def _value(token: str, name: str) -> int:
    """One cron value: a digit string or a three-letter name."""
    if token.isdigit():
        return int(token)
    alias = _NAMES.get(name, {}).get(token.lower())
    if alias is None:
        raise ValueError(f"bad value in {name!r} field: {token!r}")
    return alias


def _parse_field(text: str, name: str) -> frozenset[int]:
    """One cron field → the set of allowed values."""
    lo, hi = _BOUNDS[name]
    out: set[int] = set()
    for expr in text.split(","):
        expr = expr.strip()
        step = 1
        stepped = False
        if "/" in expr:
            expr, step_s = expr.split("/", 1)
            if not step_s.isdigit() or int(step_s) < 1:
                raise ValueError(f"bad step in {name!r} field: {step_s!r}")
            step = int(step_s)
            stepped = True
        if expr == "*":
            a, b = lo, hi
        elif "-" in expr:
            a_s, b_s = expr.split("-", 1)
            a, b = _value(a_s, name), _value(b_s, name)
        else:
            a = b = _value(expr, name)
            if stepped:
                # vixie/croniter: a bare value with a step means
                # value..max/step ('5/2' in the hour field = 5,7,…,23)
                b = hi
        if not (lo <= a <= hi and lo <= b <= hi):
            raise ValueError(f"{name!r} value out of range [{lo},{hi}]: {expr!r}")
        if a <= b:
            out.update(range(a, b + 1, step))
        else:
            # wrap-around range ('22-2' hours, 'fri-sun' dow):
            # croniter/cronie treat a descending range as wrapping
            # through the field maximum; the step keeps counting
            # across the seam
            vals = list(range(a, hi + 1)) + list(range(lo, b + 1))
            out.update(vals[::step])
    if name == "dow" and 7 in out:  # 7 is an alias for Sunday
        out.discard(7)
        out.add(0)
    return frozenset(out)


class Cron:
    """Parsed 5-field pattern with day/time matching."""

    def __init__(self, pattern: str):
        pattern = MACROS.get(pattern.strip().lower(), pattern)
        parts = pattern.split()
        if len(parts) != 5:
            raise ValueError(f"expected 5 fields, got {len(parts)}: {pattern!r}")
        self.minutes = sorted(_parse_field(parts[0], "minute"))
        self.hours = sorted(_parse_field(parts[1], "hour"))
        self.dom = _parse_field(parts[2], "dom")
        self.months = _parse_field(parts[3], "month")
        self.dow = _parse_field(parts[4], "dow")
        self._dom_any = parts[2] == "*"
        self._dow_any = parts[4] == "*"

    def matches_date(self, d: dt.date) -> bool:
        if d.month not in self.months:
            return False
        # cron dow: 0 = Sunday; python weekday(): 0 = Monday
        dow = (d.weekday() + 1) % 7
        dom_ok = d.day in self.dom
        dow_ok = dow in self.dow
        if self._dom_any and self._dow_any:
            return True
        if self._dom_any:
            return dow_ok
        if self._dow_any:
            return dom_ok
        return dom_ok or dow_ok  # vixie OR rule

    def times(self) -> Iterator[dt.time]:
        for h in self.hours:
            for m in self.minutes:
                yield dt.time(h, m)


def cron_steps(pattern: str, start: dt.datetime, end: dt.datetime) -> list[dt.datetime]:
    """All pattern fire times in [start, end], ascending.

    Timezone-aware endpoints are normalized to naive UTC wall time —
    the axis itself is tz-naive (19-char normalized steps), and a raw
    comparison of aware vs the naive combine() timestamps would raise
    TypeError."""
    if start.tzinfo is not None:
        start = start.astimezone(dt.timezone.utc).replace(tzinfo=None)
    if end.tzinfo is not None:
        end = end.astimezone(dt.timezone.utc).replace(tzinfo=None)
    cron = Cron(pattern)
    out: list[dt.datetime] = []
    times = list(cron.times())
    day = start.date()
    while day <= end.date():
        if cron.matches_date(day):
            for t in times:
                ts = dt.datetime.combine(day, t)
                if start <= ts <= end:
                    out.append(ts)
        day += dt.timedelta(days=1)
    return out
