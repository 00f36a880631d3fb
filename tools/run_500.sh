#!/bin/sh
# 500-epoch reference-scale campaign supervisor (round-4 VERDICT #3;
# reference GAN_epoch=500, train_nele.py:35).
#
# The remote-tunnel client retains every host->device upload in host RSS
# for the life of the process (measured: tools/prof_leak.py; ~0.3-0.6
# GB/epoch at reference scale from the growing replay pass), so the
# trainer exits CLEANLY with rc 17 when NELE_MAX_RSS_GB is crossed —
# after the epoch checkpoint is safely on disk — and this loop
# relaunches the process, which resumes exactly (params, opt, RNG
# streams, replay list, history, telemetry, cumulative phase timing all
# ride in the per-epoch checkpoint + sidecar).
#
# Any other exit code stops the loop: run_with_recovery inside the
# process already retries tunnel drops, so a non-17 exit is a real bug
# or a completed campaign.
#
# Report artifacts for an in-progress campaign:
#   python tools/make_training_report.py --out artifacts/train_report_500 \
#       --epochs 500 --finalize-only
cd "$(dirname "$0")/.." || exit 1
OUT=${OUT:-artifacts/train_report_500}
EPOCHS=${EPOCHS:-500}
: "${NELE_MAX_RSS_GB:=80}"
export NELE_MAX_RSS_GB
while :; do
    python tools/make_training_report.py --out "$OUT" \
        --epochs "$EPOCHS" --recover
    rc=$?
    [ "$rc" -eq 17 ] || exit "$rc"
    echo "[supervisor] rss-guard exit: relaunching to shed tunnel-client RSS"
done
