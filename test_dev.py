#! /usr/bin/env python
"""COCO test-dev submission json export (reference test_dev.py re-built).

python test_dev.py --config=0
Writes eval_results/bbox_detections.json for Codalab submission.
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from eval import main

if __name__ == "__main__":
    main(type_="test_dev")
