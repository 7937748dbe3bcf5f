"""Shared statistical-test helpers.

`anderson_normal_p15` wraps `scipy.stats.anderson` across the scipy 1.17
API transition: before 1.19 the result carries `critical_values` /
`significance_level` (and 1.17 emits a FutureWarning about the new
`method` parameter); from 1.19 only a `pvalue` is available. Both forms
implement the same check the reference suite uses
(`/root/reference/testing/test_verlet_sgld.py`): reject normality at the
15% significance level.
"""
import warnings

import scipy.stats


def anderson_normal_p15(x) -> bool:
    "True iff an Anderson-Darling test does NOT reject normality at p=0.15"
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", FutureWarning)
        res = scipy.stats.anderson(x, dist="norm")
    if hasattr(res, "critical_values"):
        crit = res.critical_values
        sig = res.significance_level
        assert sig[0] == 15
        return bool(res.statistic < crit[0])
    return bool(res.pvalue > 0.15)  # scipy >= 1.19
