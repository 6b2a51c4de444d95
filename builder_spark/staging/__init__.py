"""Staged (NOT registered, NOT graded) operators awaiting a future
registration round. Modules here are invisible to ``load_all()`` and
to the queries-package loud-import contract — the staging area exists
precisely so an unregistered module cannot trip either."""
