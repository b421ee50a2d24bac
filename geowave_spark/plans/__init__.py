"""Query planning: cell-range decomposition → Catalyst pruning predicates."""
