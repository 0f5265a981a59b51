# Shared helper for the on-chip experiment queues. Source after setting
# OUT. STRICTLY one experiment at a time (CLAUDE.md: concurrent
# measurements on the single chip fabricate deltas).
phase() {  # phase <name> <cmd...>
  local name=$1; shift
  if [ -f $OUT/$name.done ]; then echo "[queue] $name: done, skip"; return; fi
  echo "[queue] $name: $*"
  # only mark done on SUCCESS — a wedged-tunnel failure must not be skipped
  # on the next watcher pass (the round-3 ldm400_time_* lesson)
  if "$@" 2>&1 | tee -a $OUT/$name.log; then
    touch $OUT/$name.done
  else
    echo "[queue] $name FAILED rc=$? (left without .done for retry)"
  fi
}
