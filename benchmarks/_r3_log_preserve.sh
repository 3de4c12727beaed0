#!/bin/bash
# Wait for the offset/stack probe pipeline to finish, then snapshot its
# (gitignored) raw log into a tracked file so the measurements survive
# an unattended round end.
cd /root/repo || exit 1
while ! grep -q "pipeline + refresh done" benchmarks/_offset_probe.log 2>/dev/null; do
  sleep 300
done
{
  echo "# Raw OFFSET_STATE / STACK_SCALAR sweep log (round 3, unattended run)"
  echo
  echo '```'
  cat benchmarks/_offset_probe.log
  echo '```'
} > benchmarks/offset_probe_raw.md
