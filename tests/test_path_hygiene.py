"""Static guard for the shared-tmp-root bug class.

``tmp_root`` is a SESSION-scoped fixture shared by every test file, so
two files using the same path prefix under it silently share on-disk
state — the later-alphabetical test then runs against a table the
earlier one already populated. This has caused two real failures
(cross-file `ms_` collision fixed in dadee4e; `mm_target` shared by
test_bucket_aggregate and test_changefeed, caught by the round-5 full
run). This test makes the invariant mechanical: any path component
used directly under ``tmp_root`` must be unique to one test file.
"""

import collections
import glob
import os
import re

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))


def test_tmp_root_prefixes_unique_per_file():
    users = collections.defaultdict(set)
    for path in glob.glob(os.path.join(TESTS_DIR, "*.py")):
        name = os.path.basename(path)
        if name == os.path.basename(__file__):
            continue
        with open(path) as f:
            src = f.read()
        for m in re.finditer(r"tmp_root\}?/([A-Za-z0-9_]+)", src):
            users[m.group(1)].add(name)
    collisions = {p: sorted(fs) for p, fs in users.items() if len(fs) > 1}
    assert not collisions, (
        f"tmp_root path prefixes shared across test files (shared "
        f"session-scoped dir => cross-test on-disk state bleed): "
        f"{collisions}"
    )
