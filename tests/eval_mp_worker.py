"""Subprocess worker for the 2-process distributed-eval test: pins the
CPU backend, then runs the real validate.py CLI via runpy."""
import sys

import jax

jax.config.update('jax_platforms', 'cpu')

import runpy  # noqa: E402
import os     # noqa: E402

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.argv = ['validate.py'] + sys.argv[1:]
runpy.run_path(os.path.join(repo, 'validate.py'), run_name='__main__')
