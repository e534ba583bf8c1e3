#!/usr/bin/env bash
# Mutation audit of the oracle gate (r12 verdict task 1): seeded
# plausible wrong-code edits, one per query family, must each turn a
# gate red (DuckDB compare for oracle entries, verdict booleans for
# the no_oracle trio, BoundaryFixtureSpec for the m33/m34 boundary
# edges the sf0.01 shapes don't exercise). See tools/audit_mutation.py
# for the spec and mechanics. MUST NOT run concurrently with sbt test.
#
# Usage: tools/audit_mutation.sh [--validate] [mutation-id ...]
exec python3 "$(dirname "$0")/audit_mutation.py" "$@"
