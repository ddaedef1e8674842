"""Frozen YOLOv3 evaluator: detection loss for ISP search/training."""
