from tpu_plume.cli.main import main

main()
