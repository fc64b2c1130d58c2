from raptor_tpu.cli import main

main()
