#!/bin/bash
# Run a command in the persistent tmux sbt shell and wait for the prompt.
# Usage: tools/sbtrun.sh "<sbt command>" [timeout_seconds]
CMD="$1"; TMO="${2:-600}"
tmux send-keys -t sbt "$CMD" Enter
sleep 2
for i in $(seq 1 $((TMO/3))); do
  # done when the last non-blank line is exactly the idle prompt
  last=$(tmux capture-pane -t sbt -p | grep -v '^[[:space:]]*$' | tail -1 | sed 's/[[:space:]]*$//')
  if [ "$last" = "sbt:rwa_calculatorspark>" ]; then break; fi
  sleep 3
done
tmux capture-pane -t sbt -p -S -200 | grep -v "INFO\|WARN\|rror\]" | tail -6
