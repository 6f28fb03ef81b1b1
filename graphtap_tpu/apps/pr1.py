"""pr1: two-load PageRank binary (reference: src/apps/pr1.cpp) — loads
the graph twice (untransposed for degree, transposed for PR), plain
TCSC (pr1.cpp:32-53)."""
from graphtap_tpu.apps.pagerank import run_pagerank_two_load
from graphtap_tpu.apps._cli import app_main, timed


def _run(path, nv, iters, kernel):
    return timed(run_pagerank_two_load, path, nv, num_iterations=iters,
                 kernel=kernel)


if __name__ == "__main__":
    app_main("pr1", _run)
