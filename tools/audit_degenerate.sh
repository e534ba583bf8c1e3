#!/usr/bin/env bash
# Degenerate-dir twin audit (SURVEY §8.9): run the full registry via
# graft.Verify against each degenerate fixture dir, then replay every
# oracle twin in DuckDB over the SAME dir and value-compare.
#
# The sf0.01 oracle gate proves cross-engine equality on WELL-FORMED
# data; this audit proves the twins stay engine-SYMMETRIC on the shapes
# the DegenerateInputSpec sweeps only crash-test (empty / tiny / const /
# all-NULL measures / plausible outliers) — a twin that throws or
# diverges on a dirty feed would silently weaken the oracle the round
# the driver's testdata grows such rows.
#
# Prereqs: fixtures built (sbt "testOnly graft.DegenerateInputSpec"),
# classes compiled. MUST NOT run concurrently with sbt test: the
# roundtrip queries (q17b/c/d/l) write to fixed temp dirs and the
# audit would race the specs on them.
#
# Default shapes: empty tiny flat nulls outlier mixed heavy
# heavyprice heavytie linkedmixed. `mixed`
# (3 rows, middle row's non-key columns NULL) is the shape the all-NULL
# dir is accidentally symmetric on — per-group sequences mixing null
# and valid order keys flush engine null-ordering defaults; it caught
# three live twin divergences on first run (q3b/q28/q9r, SURVEY §8.11).
# `heavy` (one lineitem group of four rows where a NULL-quantity cell
# carries a weight LARGE relative to the partition) is the shape mixed
# is accidentally symmetric on — mixed nulls whole rows, so a null
# ORDERING value never carries valid weight; it caught q9q's weighted
# median live on first run (r14). `heavyprice` is the same idea on the
# MONETARY axis (four orders of one customer, one NULL o_totalprice
# inside a multi-cell segment); it caught q9u's lower-median walk live
# on first run (r15). `heavytie` is the first REFERENTIALLY-LINKED
# dirty star (every FK wired to rn-1, an exact 3-way revenue tie, one
# NULL n_name) — the other shapes never resolve the fact joins, so
# dirty dim attributes inside resolved join groups were unexercised;
# it caught q9f's rank tiebreak AND q9o's null-group-dropping rejoin
# live on first run (r15). `linkedmixed` layers the mixed middle-row
# nulls over that wiring (dirty VALUES through resolved joins); it
# caught q21's NULL-revenue→0.0 heap coercion and the q26c/q26d twins
# dropping the NULL-segment group live on first run (r15). `linkedseq`
# is the SEQUENCE axis over the same wiring (a NULL order date inside
# ONE customer's multi-order chain, a NULL-ts click before a purchase,
# and an EXACT-30-min event gap); it caught five live divergences on
# first run (r16): q25c's next-item rank, q27/q27b's EMA/Holt seed,
# q24d's asof carry (fixed at the AsofJoin operator), and q15d's
# session boundary (Spark merges on touch; the twin's >= was wrong).
# `boundary` (r17) is the EXACT-EDGE sweep for the boundary-semantics
# class q15d named: clean, fully-linked values planted exactly ON
# every edge the registry uses (ntile remainder cuts with a tie
# straddling the cut, q21's rank-k tie, as-of/interval/multitouch
# endpoint equality, exact 30-min session touches, floor-band and
# on-time-delay edges, dist exactly 0, HLL small-n cardinalities);
# it caught q26a's relative-only sketch tolerance live on first
# replay (the HLL integer-granularity floor — fixed rel+abs, m53).
# `const` is CRASH-SWEEP
# ONLY (DegenerateInputSpec): it replicates primary keys ×8, and the
# twins' key-joins legitimately assume unique warehouse keys — `flat`
# is the key-unique zero-variance shape the audit uses instead.
#
# Known audit exclusions (oracle-TOOL limitations, not divergences),
# MECHANIZED below — any OTHER failing query, or an exclusion that
# stops failing (stale entry), exits nonzero, so the audit is a
# ratchet in both directions like DegenerateInputSpec's allowlists:
#   empty/nulls q17g, empty q17h — Spark writes NO files for an empty
#     partitioned/bucketed write and DuckDB's read_parquet glob throws
#     on a zero-match pattern; the Spark side itself is crash-free.
#   outlier q14j — the twin's INT64 fixed-point power iteration
#     overflows loudly outside the documented ItScale envelope while
#     Spark's driver-float iteration does not (see PcaQueries).
#
# Usage: tools/audit_degenerate.sh [shape ...]   (default set above)
set -u
cd "$(dirname "$0")/.."
# single source of truth for the exclusions: shape/query pairs; both
# the FAIL-tolerance check and the staleness check derive from it
EXCLUSIONS="empty/q17g_partition_audit empty/q17h_bucket_audit \
nulls/q17g_partition_audit outlier/q14j_pca_project"
excluded() { # excluded <shape> <query>
  case " $EXCLUSIONS " in
    *" $1/$2 "*) return 0 ;;
    *) return 1 ;;
  esac
}
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
shapes=("$@")
[ $# -eq 0 ] && shapes=(empty tiny flat nulls outlier mixed heavy heavyprice heavytie linkedmixed linkedseq boundary)
rc=0
for shape in "${shapes[@]}"; do
  dir="target/degenerate/$shape"
  out="/tmp/degenerate_audit/$shape"
  if [ ! -f "$dir/_BUILT" ]; then
    echo "== $shape: fixture missing ($dir) — run DegenerateInputSpec first"
    rc=1; continue
  fi
  rm -rf "$out"
  echo "== $shape: Verify =="
  # shellcheck disable=SC2086
  java $OPENS -Xmx8g -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
    graft.Verify "$dir" "$out" 2>&1 | grep "^\[verify\]" || true
  # a Verify that died at startup (bad classpath, OOM) leaves no
  # oracle dump — that must read as a loud failure, not an empty
  # (vacuously green) replay
  if [ ! -f "$out/oracle_sql.json" ]; then
    echo "** $shape: Verify produced no oracle dump ($out)"; rc=1; continue
  fi
  echo "== $shape: DuckDB twin replay =="
  # check_oracle exits 1 when any query FAILs — that is a per-query
  # verdict the loops below adjudicate against the exclusions, not a
  # tool failure, so capture output regardless of exit status; a
  # genuine tool crash (traceback, no summary) is caught by the
  # summary-line check
  replay=$(python3 tools/check_oracle.py "$dir" "$out") || true
  echo "$replay" | grep -v "^PASS" || true
  # an empty/summary-less replay means the compare never ran
  if ! echo "$replay" | grep -qE "^== [1-9][0-9]* pass"; then
    echo "** $shape: replay produced no pass/fail summary"; rc=1; continue
  fi
  # ratchet: every FAIL must be a known exclusion, and every known
  # exclusion for this shape must still FAIL (stale otherwise)
  while read -r q; do
    [ -n "$q" ] || continue
    if ! excluded "$shape" "$q"; then
      echo "** $shape: UNEXPECTED failure $q"; rc=1
    fi
  done <<< "$(echo "$replay" | sed -n 's/^FAIL \([^:]*\):.*/\1/p')"
  for sq in $EXCLUSIONS; do
    [ "${sq%%/*}" = "$shape" ] || continue
    q="${sq#*/}"
    if ! echo "$replay" | grep -q "^FAIL $q:"; then
      echo "** $shape: STALE exclusion $q (no longer fails)"; rc=1
    fi
  done
done
exit $rc
