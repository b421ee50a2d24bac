"""Row-level visibility filtering (ClientVisibilityFilter analog)."""

import pandas as pd
import pytest

from geowave_spark.visibility import evaluate_visibility, visibility_filter


class TestExpressionEval:
    @pytest.mark.parametrize(
        "expr,auths,want",
        [
            ("a", {"a"}, True),
            ("a", {"b"}, False),
            ("a&b", {"a", "b"}, True),
            ("a&b", {"a"}, False),
            ("a|b", {"b"}, True),
            ("a|b", {"c"}, False),
            ("a&(b|c)", {"a", "c"}, True),
            ("a&(b|c)", {"a"}, False),
            ("(a|b)&(c|d)", {"b", "d"}, True),
            ("(a|b)&(c|d)", {"b"}, False),
            ("", {"a"}, True),
            (None, set(), True),
            ("secret & (ops | admin)", {"secret", "admin"}, True),
        ],
    )
    def test_cases(self, expr, auths, want):
        assert evaluate_visibility(expr, auths) is want

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            evaluate_visibility("a&(b", {"a"})
        with pytest.raises(ValueError):
            evaluate_visibility("a&&b", {"a"})


def test_dataframe_filter(spark):
    pdf = pd.DataFrame(
        {
            "fid": [0, 1, 2, 3, 4],
            "visibility": ["a", "a&b", "a|b", "secret", None],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r["fid"] for r in visibility_filter(df, {"a"}).collect()}
    assert got == {0, 2, 4}
    got = {r["fid"] for r in visibility_filter(df, {"a", "b", "secret"}).collect()}
    assert got == {0, 1, 2, 3, 4}
    got = {r["fid"] for r in visibility_filter(df, set()).collect()}
    assert got == {4}
