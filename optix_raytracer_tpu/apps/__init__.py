"""The sample suite, re-created as runnable apps (the acceptance surface).

Each module mirrors one reference sample (SURVEY.md §2.4) and has a `main(argv)`
plus an importable `render(...)` so tests run them headless — the
`--file` mode every reference sample exposes (e.g.
`SDK/optixPathTracer/optixPathTracer.cpp:1052-1090`).
"""
