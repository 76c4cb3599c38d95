#!/bin/bash
# moved to extra_stage_16_crossover.sh (run-order deprioritized: the
# 100k/1M XLA compiles are the most expensive relay-minutes; ladder +
# bucket-MFU hooks carry more unique evidence per minute tonight)
echo "crossover moved to stage 16"
