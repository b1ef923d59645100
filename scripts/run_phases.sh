#!/bin/bash
cd /root/repo
export OSMZEN_STAGE_CHECKPOINT=parquet
python scripts/profile_scaling_phases.py 32 4 > /tmp/phases32_pq.out 2>&1
python scripts/profile_scaling_phases.py 8 4 > /tmp/phases8_pq.out 2>&1
