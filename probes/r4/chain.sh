#!/bin/bash
# Wait for the in-flight pallas rerace to finish, then run campaign2.
cd /root/repo
while ! grep -q "rerace done" probes/r4/pallas_rerace.log 2>/dev/null; do
  sleep 20
done
./probes/r4/campaign2.sh > probes/r4/campaign2.log 2>&1
