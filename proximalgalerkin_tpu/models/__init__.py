from .obstacle import (
    setup_obstacle_problem, solve_obstacle_problem, spherical_cap_obstacle,
    ObstacleProblem,
)

__all__ = [
    "setup_obstacle_problem", "solve_obstacle_problem",
    "spherical_cap_obstacle", "ObstacleProblem",
]
