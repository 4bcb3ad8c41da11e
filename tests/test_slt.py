"""sqllogictest conformance against the reference's slt suite.

The .slt files under /root/reference/tests/slt are the behavioral spec
(reference tests/sqllogictest/tests/sqllogictest.rs runs each against both
engine generations). Output must be bit-exact.
"""

import os

import pytest

from tests.slt_runner import ENGINES, all_slt_files, run_slt_file

FILES = all_slt_files()

pytestmark = pytest.mark.skipif(
    not FILES, reason="reference slt suite not available"
)


@pytest.mark.parametrize(
    "path,engine",
    [(f, e) for f in FILES for e in ENGINES],
    ids=[f"{os.path.basename(f)}-{e}" for f in FILES for e in ENGINES],
)
def test_slt(path, engine):
    failures = run_slt_file(path, engine)
    assert not failures, "\n".join(str(f) for f in failures)
