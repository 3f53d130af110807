"""Guards for scripts/probe_containment_width.py's measurement contract
(ADVICE r12): the width label in an arm's result JSON must be the
EFFECTIVE shuffle width, and a timed-out arm must never leave a zombie
JVM contaminating the other arm. Both are pinned structurally (source
inspection) — running the real probe is a ~45-minute decade job, and the
r12 lesson was precisely that an unexercised harness can ship broken.
"""

from __future__ import annotations

import ast
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "probe_containment_width.py",
)


def _load():
    spec = importlib.util.spec_from_file_location("probe_width", PROBE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_arms_are_the_directive_pair():
    assert _load().ARMS == ("1024", "4096")


def test_child_sets_its_own_scale_env_before_session_import():
    """A manual `--arm 4096` invocation must run AT width 4096, not at
    the default with a 4096 label: run_arm must set the scale-mode and
    width env vars BEFORE importing collimate_spark.session (confs are
    read at builder time)."""
    src = open(PROBE).read()
    tree = ast.parse(src)
    fn = next(
        n for n in ast.walk(tree)
        if isinstance(n, ast.FunctionDef) and n.name == "run_arm"
    )
    env_line = session_import_line = None
    for node in ast.walk(fn):
        if (
            isinstance(node, ast.Assign)
            and isinstance(node.targets[0], ast.Subscript)
            and isinstance(node.targets[0].slice, ast.Constant)
            and node.targets[0].slice.value == "SPARK_GRAFT_INITIAL_PARTITIONS"
        ):
            env_line = node.lineno
        if isinstance(node, ast.ImportFrom) and node.module == "collimate_spark.session":
            session_import_line = node.lineno
    assert env_line is not None, "run_arm no longer sets SPARK_GRAFT_INITIAL_PARTITIONS"
    assert session_import_line is not None, "run_arm no longer imports session lazily"
    assert env_line < session_import_line, "env must be set BEFORE the session import"


def test_child_emits_effective_conf_not_label():
    src = open(PROBE).read()
    assert "spark.sql.adaptive.coalescePartitions.initialPartitionNum" in src


def test_parent_uses_process_group_kill():
    """Timeout handling must kill the arm's whole process group (the
    Spark JVM grandchild holds the capture pipes otherwise)."""
    src = open(PROBE).read()
    assert "start_new_session=True" in src
    assert "os.killpg" in src
