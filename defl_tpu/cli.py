"""Console entry points (pyproject [project.scripts])."""


def bench_main():
    from defl_tpu.bench import main

    main()
