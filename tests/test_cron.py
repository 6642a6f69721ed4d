"""5-field cron expansion (plans/cron.py) — croniter-parity goldens
(reference expands its time axis with croniter, _output.py:641-649)
plus the ADVICE-r1 hourly-axis regressions."""

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapchete_xarray_spark.plans.cron import Cron, cron_steps
from mapchete_xarray_spark.sources.tiledir import normalize_step

S = dt.datetime(2022, 3, 1)
E = dt.datetime(2022, 3, 31, 23, 59)


def test_daily():
    out = cron_steps("0 0 * * *", S, E)
    assert len(out) == 31
    assert out[0] == dt.datetime(2022, 3, 1)


def test_hourly():
    out = cron_steps("30 * * * *", S, dt.datetime(2022, 3, 1, 23, 59))
    assert len(out) == 24
    assert out[0] == dt.datetime(2022, 3, 1, 0, 30)


def test_step_and_range():
    out = cron_steps("0 9-17/4 * * *", S, dt.datetime(2022, 3, 1, 23))
    assert [t.hour for t in out] == [9, 13, 17]


def test_list_values():
    out = cron_steps("0,30 6 1,15 * *", S, E)
    assert [(t.day, t.hour, t.minute) for t in out] == [
        (1, 6, 0), (1, 6, 30), (15, 6, 0), (15, 6, 30)
    ]


def test_dow():
    # Fridays in March 2022: 4, 11, 18, 25
    out = cron_steps("0 12 * * 5", S, E)
    assert [t.day for t in out] == [4, 11, 18, 25]
    # 7 is an alias for Sunday (0)
    assert cron_steps("0 0 * * 7", S, E) == cron_steps("0 0 * * 0", S, E)


def test_dom_dow_or_rule():
    # vixie rule: both restricted → union.  Day 15 OR Fridays.
    out = cron_steps("0 0 15 * 5", S, E)
    assert [t.day for t in out] == [4, 11, 15, 18, 25]


def test_inclusive_endpoints():
    out = cron_steps("0 0 * * *", dt.datetime(2022, 3, 5), dt.datetime(2022, 3, 7))
    assert [t.day for t in out] == [5, 6, 7]


@pytest.mark.parametrize("bad", ["0 0", "x * * * *", "0 24 * * *", "0 0 0 * *", "0 0 * * 8", "*/0 * * * *"])
def test_invalid(bad):
    with pytest.raises(ValueError):
        Cron(bad)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(0, 59), st.integers(0, 23),
    st.integers(1, 28), st.integers(1, 12),
)
def test_single_datetime_roundtrip(minute, hour, dom, month):
    """A fully-pinned pattern fires exactly once per year."""
    pat = f"{minute} {hour} {dom} {month} *"
    out = cron_steps(pat, dt.datetime(2022, 1, 1), dt.datetime(2022, 12, 31, 23, 59))
    assert out == [dt.datetime(2022, month, dom, hour, minute)]


def test_bare_value_with_step_is_value_to_max():
    """vixie/croniter: 'N/step' = N..max/step, NOT just {N}.
    croniter('0 5/2 * * *') fires at hours 5,7,9,…,23."""
    out = cron_steps("0 5/2 * * *", S, dt.datetime(2022, 3, 1, 23, 59))
    assert [t.hour for t in out] == list(range(5, 24, 2))
    # minute field: '10/15' → 10, 25, 40, 55
    outm = cron_steps("10/15 0 * * *", S, dt.datetime(2022, 3, 1, 23, 59))
    assert [t.minute for t in outm] == [10, 25, 40, 55]


def test_month_and_dow_names():
    """crontab(5) three-letter names, case-insensitive, in values and
    ranges — croniter-documented expansions."""
    year_s, year_e = dt.datetime(2022, 1, 1), dt.datetime(2022, 12, 31, 23, 59)
    assert cron_steps("0 0 1 jan *", year_s, year_e) == cron_steps(
        "0 0 1 1 *", year_s, year_e
    )
    assert cron_steps("0 0 1 JAN,jul *", year_s, year_e) == cron_steps(
        "0 0 1 1,7 *", year_s, year_e
    )
    # mon-fri range == 1-5; fridays-only golden reused from test_dow
    assert cron_steps("0 12 * * mon-fri", S, E) == cron_steps(
        "0 12 * * 1-5", S, E
    )
    assert [t.day for t in cron_steps("0 12 * * fri", S, E)] == [4, 11, 18, 25]


def test_macros():
    """@daily-family macros expand to their vixie 5-field forms."""
    assert cron_steps("@daily", S, E) == cron_steps("0 0 * * *", S, E)
    assert cron_steps("@midnight", S, E) == cron_steps("0 0 * * *", S, E)
    assert cron_steps("@hourly", S, dt.datetime(2022, 3, 1, 23, 59)) == cron_steps(
        "0 * * * *", S, dt.datetime(2022, 3, 1, 23, 59)
    )
    assert cron_steps("@weekly", S, E) == cron_steps("0 0 * * 0", S, E)
    assert cron_steps("@monthly", S, E) == cron_steps("0 0 1 * *", S, E)
    year_s, year_e = dt.datetime(2022, 1, 1), dt.datetime(2022, 12, 31, 23, 59)
    assert cron_steps("@yearly", year_s, year_e) == cron_steps(
        "0 0 1 1 *", year_s, year_e
    )
    assert cron_steps("@annually", year_s, year_e) == cron_steps(
        "@yearly", year_s, year_e
    )


@pytest.mark.parametrize("bad", ["0 0 * xyz *", "0 0 * * mon-xyz", "@fortnightly"])
def test_invalid_names(bad):
    with pytest.raises(ValueError):
        Cron(bad)


def test_normalize_step():
    assert normalize_step("2022-06-01") == "2022-06-01 00:00:00"
    assert normalize_step("2022-06-01T06:30:00") == "2022-06-01 06:30:00"
    assert normalize_step("2022-06-01 06:30") == "2022-06-01 06:30:00"
    # hourly steps on one date stay DISTINCT (ADVICE r1: the old
    # date-prefix ts_index collapsed them to one key)
    steps = [normalize_step(s) for s in ("2022-06-01 00:00:00", "2022-06-01 06:00:00")]
    assert len(set(steps)) == 2


def test_tz_aware_endpoints_normalize():
    """Timezone-aware start/end must not raise TypeError against the
    naive axis — they normalize to UTC wall time."""
    import datetime as dt

    from mapchete_xarray_spark.plans.cron import cron_steps

    tz = dt.timezone(dt.timedelta(hours=2))
    aware = cron_steps(
        "0 0 * * *",
        dt.datetime(2022, 3, 1, tzinfo=tz),
        dt.datetime(2022, 3, 4, tzinfo=tz),
    )
    naive = cron_steps(
        "0 0 * * *",
        dt.datetime(2022, 2, 28, 22, 0),
        dt.datetime(2022, 3, 3, 22, 0),
    )
    assert aware == naive and len(aware) == 3


def test_wraparound_ranges():
    """Descending ranges wrap through the field max (croniter/cronie
    semantics): '22-2' hours = 22,23,0,1,2; 'fri-sun' dow = fri,sat,sun."""
    import datetime as dt

    from mapchete_xarray_spark.plans.cron import Cron, cron_steps

    hours = {
        t.hour
        for t in cron_steps(
            "0 22-2 * * *", dt.datetime(2022, 3, 1), dt.datetime(2022, 3, 2)
        )
    }
    assert hours == {22, 23, 0, 1, 2}
    days = {
        d.date().isoweekday()
        for d in cron_steps(
            "0 0 * * fri-sun", dt.datetime(2022, 3, 1), dt.datetime(2022, 3, 14)
        )
    }
    assert days == {5, 6, 7}
    # step counts across the seam
    assert sorted(Cron("0 22-4/2 * * *").hours) == [0, 2, 4, 22]
