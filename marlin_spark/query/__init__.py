"""Query engine: planner, exact scorer, block-max WAND, filters, aggs."""
