#!/bin/bash
# Run a command in the persistent tmux sbt shell and wait for the prompt.
# Usage: tools/sbtrun.sh "<sbt command>" [timeout_seconds]
CMD="$1"; TMO="${2:-600}"
tmux send-keys -t sbt "$CMD" Enter
sleep 3
for i in $(seq 1 $((TMO/5))); do
  last=$(tmux capture-pane -t sbt -p | grep -v '^$' | tail -1)
  case "$last" in
    *"sbt:rwa_calculatorspark>"*) break;;
  esac
  sleep 5
done
tmux capture-pane -t sbt -p -S -200 | grep -v "INFO\|WARN\|rror\]" | tail -6
