# Developer entry points. `make pre-driver` is the gate to run before
# every driver round: the 50-query window on a VANILLA SparkSession,
# compared against the DuckDB oracles at the driver's own scale —
# exits non-zero on any diff (VERDICT r6 directive #6).

PY ?= python3

.PHONY: test pre-driver mirror-sf001 mirror-sf01 mirror-scale-mode bench bench-wide calibrate plans

test:
	$(PY) -m pytest tests/ -x -q

# Simulate the driver's CORRECTNESS gate: vanilla session, sf0.01,
# first-50 window, DuckDB compare. Fails loudly on any diff.
pre-driver:
	$(PY) scripts/driver_sim.py

# Full oracle mirrors (every DuckDB-oracled query, not just the window).
mirror-sf001:
	$(PY) -m pytest tests/test_oracle_parity.py -m sf001 -q

mirror-sf01:
	$(PY) -m pytest tests/test_oracle_parity.py -m sf01 -q

# Full sf0.01 oracle mirror under the DEPLOY.md cluster confs
# (SPARK_GRAFT_SCALE_MODE=1: initialPartitionNum=1024 + zstd). The scale
# confs change shuffle widths and therefore float-sum orders; the
# 6dp/audit-bit oracle contracts must be INVARIANT to that — this target
# proves the cluster config is hash-safe, not assumed (VERDICT r10 #3).
# Run once per round.
mirror-scale-mode:
	SPARK_GRAFT_SCALE_MODE=1 $(PY) -m pytest tests/test_oracle_parity.py -m sf001 -q

bench:
	$(PY) bench.py

bench-wide:
	$(PY) bench.py --wide

# 10-second host-state check (both frozen calibration probes, no
# queries) — run before trusting any perf number on this box.
calibrate:
	$(PY) bench.py --calibrate

plans:
	$(PY) -m collimate_spark.plans

# Quadratic-candidate screen (VERDICT r7 #8): pair-emitting dedup family
# at 10x corpus on the MUTATED replication slice (true pair output grows
# ~linearly there, so work growth is the signal), PLUS the heavy
# non-dedup surface screen at the second decade (VERDICT r8 #8).
# Rewrites both marked sweep sections of BASELINE.md.
scale-sweep:
	$(PY) scripts/scale_sweep.py --update-baseline
	$(PY) scripts/scale_sweep.py --surface --update-baseline

# Third-decade follow-up (VERDICT r9 #4): the heavies without a
# post-partition-fix 1000x number — ingest (first-ever 600M-row CSV
# cell, size-gated .gz export), asof post-grain-gate, curate_corpus,
# bm25_search, block_dedup_stats — at /tmp/sf10m -> /tmp/sf100m.
# Rewrites the decade3-sweep marker section of BASELINE.md.
scale-sweep-d3:
	SPARK_GRAFT_DRIVER_MEM=48g $(PY) scripts/scale_sweep.py --decade 3 --update-baseline

# Fourth-decade single-op probes (VERDICT r10 #5): cheap document shapes
# at 50M docs (documents-only slice — the full table set doesn't fit the
# box) plus pagerank on its first 10x edge-graph step (lineitem 60M ->
# 600M rows). Rewrites the decade4-sweep marker section of BASELINE.md.
scale-sweep-d4:
	SPARK_GRAFT_DRIVER_MEM=48g $(PY) scripts/scale_sweep.py --decade 4 --update-baseline

# Fifth-decade probes (VERDICT r11 #6): the two flattest decade-4 ops
# (dedup_exact 6.3x, set_overlap 1.1x) one step further — disk-bounded
# to a 4x step (200M docs; 500M would not fit the box). Rewrites the
# decade5-sweep marker section of BASELINE.md.
scale-sweep-d5:
	SPARK_GRAFT_DRIVER_MEM=48g $(PY) scripts/scale_sweep.py --decade 5 --update-baseline
