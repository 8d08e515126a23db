package graft.corpus

/** The reference's own query corpus, verbatim.
  *
  * These YAML strings are byte-faithful copies of recipes under
  * `/root/reference/examples/aggregations/` (the reference's de-facto
  * test suite, SURVEY §5): the recipe text IS the query — porting the
  * corpus means running these exact recipes against fixtures shaped like
  * their input declarations.
  *
  * Sources:
  *  - omnisci-query-times.yml   (examples/aggregations/omnisci-query-times.yml)
  *  - raw/df_clsf.yml           (examples/aggregations/raw/df_clsf.yml)
  *  - raw/rng.yml               (examples/aggregations/raw/rng.yml)
  *  - raw/blackscholes.yml      (examples/aggregations/raw/blackscholes.yml)
  *  - raw/fft.yml               (examples/aggregations/raw/fft.yml)
  *  - indicators/blackscholes.yml, indicators/fft.yml
  *  - indicators.yml, summary_indicators.yml
  */
object CorpusRecipes {

  val omnisciQueryTimes: String =
    """input:
      |    path: 'data/mapd_log/omnisci_server.INFO.*.log'
      |    format: csv
      |    csv-header: 'op,logID,queryID,execution_time_ms,total_time_ms'
      |    # Transform lines from log text into csv format. Drop other, unused lines
      |    filter:
      |        '^(?!.+ ? ([0-9]+))': append
      |        '^.+ ? ([0-9]+).+ stdlog sql_execute ([0-9]+) .+,"(\d+)","(\d+)"\}': 'sql_execute,\1,\2,\3,\4'
      |        '^(?!sql_)': drop
      |
      |# Aggregation method (e.g. min, median, max, mean)
      |aggregation: mean
      |
      |# Axis and series column names
      |axis:
      |    - queryID
      |
      |#series:
      |#    - Prefix
      |
      |values:
      |    - execution_time_ms
      |    - total_time_ms
      |
      |# Create another table (or Excel filter) for each value in these columns
      |variants:
      |    - logID
      |
      |# Are higher values better?
      |higher-is-better: false
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  val dfClsf: String =
    """# Unix-style globbing is supported.
      |input:
      |    path: 'runs/*/*/*/*_df_clsf.out'
      |    format: csv
      |    filter:
      |        'prefix_ID': 'Prefix'
      |        '^@': drop
      |        '^Native-C':
      |# Aggregation method (e.g. min, median, max, mean)
      |aggregation: mean
      |
      |# Axis and series column names
      |axis:
      |    - Size
      |    - classes
      |    - Mode
      |    - Function
      |
      |series:
      |    - Prefix
      |
      |rename:
      |    fit: df_clsf.fit
      |    predict: df_clsf.predict
      |
      |pack:
      |    - columns: [df_clsf.fit, df_clsf.predict]
      |      name: Function
      |      value: Time
      |
      |values:
      |    - Time
      |
      |# Create another table (or Excel filter) for each value in these columns
      |variants:
      |    - Arch
      |
      |# Are higher values better?
      |higher-is-better: false
      |
      |# Precompute columns using lambda functions
      |precomputed:
      |    Size: "'{}x{}'.format(row['rows'], row['features'])"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |    Mode: "'Serial' if row['threads'] == 'Serial' or row['threads'] == 1 else 'Parallel'"
      |
      |filter-out:
      |    classes: [2, 3]
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  val rawBlackscholes: String =
    """# File names which should be inputs to this benchmark.
      |# Unix-style globbing is supported.
      |input:
      |    path: 'runs/*/*/*/*_blackscholes_*.out'
      |    filter:
      |        'Native-C-(S?VML)(.*)$': '\1\2Native-C'
      |        'Numba@jit-loop-par': 'numba'
      |        'Numba@jit-loop': 'numba'
      |        '^ERF: ([^\s]+): Size: ([\d]+) MOPS: ([\d.]+) ?([^\s]+)$': '\1, \2, \3, \4'
      |        "Using": drop
      |
      |    # Format of input files
      |    format: csv
      |    csv-header: 'Implementation, Size, MOPS, Prefix'
      |
      |# Aggregation method (e.g. min, median, max, mean)
      |aggregation: mean
      |
      |# Axis and series column names
      |axis:
      |    - Size
      |
      |series:
      |    - Prefix
      |    - Implementation
      |    - Accuracy
      |
      |variants:
      |    - Mode
      |    - Arch
      |
      |# Are higher values better?
      |higher-is-better: true
      |
      |# Value columns
      |values:
      |    - MOPS
      |
      |# Precompute columns using lambda functions
      |precomputed:
      |    Mode: "'Serial' if row['File'].split('.')[1].split('_')[-1] == 'seq' else 'Parallel'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |    Prefix: "row['Prefix'] if row['Prefix'] else 'Native-C'"
      |    Accuracy: "row['acc'] if row['Prefix'] == 'Native-C' else 'ha'"
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  val rawFft: String =
    """# File names which should be inputs to this benchmark.
      |# Unix-style globbing is supported.
      |input:
      |    path:
      |    - 'runs/*/*/*/*_fft*.out'
      |    - 'runs/*/*/*/*_rfft*.out'
      |    # Format of input files
      |    format: csv
      |    csv-header: 'Min, Median, Max'
      |    filter:
      |        '^TAG': drop
      |        '^\$PREFIX': drop
      |        '^======': drop
      |        '[\w.]+, [\w.]+, [\w.]+':
      |
      |# Aggregation method (e.g. min, median, max, mean)
      |aggregation: mean
      |
      |# Axis and series column names
      |axis:
      |- Function
      |- Place
      |
      |series:
      |- Prefix
      |
      |# Create another table (or Excel filter) for each value in these columns
      |variants:
      |- Arch
      |- Mode
      |
      |# Are higher values better?
      |higher-is-better: false
      |
      |# Value columns
      |values:
      |- Median
      |
      |# Precompute columns using lambda functions
      |precomputed:
      |    Mode: "'Serial' if row['File'].split('.')[1].split('_')[3] == 'seq' else 'Parallel'"
      |    Function: "row['File'].split('.')[1].split('_')[1]"
      |    Prefix: "(lambda p: 'Native-C' if p == 'native' else p)(row['Directory'].split('/')[-1])"
      |    Place: "'In-place' if len(row['File'].split('.')[1].split('_')) > 4 else 'Out-of-place'"
      |    Implementation: "'numpy' if row['Place'] == 'Out-of-place' else 'scipy'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |
      |filter-in:
      |
      |filter-out:
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  val indicatorsBlackscholes: String =
    """input:
      |    config:
      |    - ../raw/blackscholes.yml
      |
      |# Aggregation method (e.g. min, median, max, mean)
      |aggregation: mean
      |
      |# Axis and series column names
      |axis:
      |    - Mode
      |    - Size
      |    - Function
      |
      |series:
      |    - Prefix
      |    - Implementation
      |    - Accuracy
      |
      |variants:
      |    - Arch
      |
      |# Are higher values better?
      |higher-is-better: true
      |
      |# Value columns
      |values:
      |    - Ratio
      |
      |# Precompute columns using lambda functions
      |precomputed:
      |    Domain: "'Numba'"
      |    Function: "'Black Scholes'"
      |    Ratio: "ratio_of('MOPS', Prefix='Native-C', Implementation='SVML', Accuracy='ha')"
      |
      |# Filter: require certain values for columns (after precompute and rename)
      |filter-in:
      |    Size:
      |    - 16777216
      |    Implementation:
      |    - numba
      |    Accuracy: [ha]
      |
      |filter-out:
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  val indicatorsFft: String =
    """input:
      |    config:
      |    - ../raw/fft.yml
      |
      |# Aggregation method (e.g. min, median, max, mean)
      |aggregation: mean
      |
      |# Axis and series column names
      |axis:
      |    - Mode
      |    - Function
      |
      |series:
      |    - Prefix
      |
      |variants:
      |    - Arch
      |    - Place
      |
      |# Are higher values better?
      |higher-is-better: true
      |
      |# Value columns
      |values:
      |    - Ratio
      |
      |# Precompute columns using lambda functions
      |precomputed:
      |    Domain: "'FFT'"
      |    Ratio: "1 / ratio_of('Median', Prefix='Native-C')"
      |    drop: "row['Prefix'] == 'Native-C'"
      |
      |# Filter: require certain values for columns (after precompute and rename)
      |filter-in:
      |    drop: [false]
      |
      |filter-out:
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** indicators.yml, verbatim — all 8 reference children listed
    * (examples/aggregations/indicators.yml:13-21). */
  val indicators: String =
    """input:
      |    path: config/targets.csv
      |    format: csv
      |
      |    # Input configuration files
      |    config:
      |    - indicators/arithmetics-mkl.yml
      |    - indicators/arithmetics-numba.yml
      |    - indicators/blackscholes.yml
      |    - indicators/fft.yml
      |    - indicators/rng.yml
      |    - indicators/linalg.yml
      |    - indicators/sklearn.yml
      |    - indicators/daal4py.yml
      |
      |higher-is-better: true
      |
      |aggregation: max
      |
      |values:
      |    - Ratio
      |
      |series:
      |    - Prefix
      |    - Mode
      |
      |axis:
      |    - Domain
      |    - Implementation
      |    - Function
      |
      |variants:
      |    - Arch
      |
      |filter-out:
      |    Prefix:
      |    - stockpython3
      |
      |    Implementation:
      |    - numexpr
      |
      |    Function:
      |    - scalar*array
      |    - scalar+array
      |    - scalar-array
      |    - scalar/array
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  val summaryIndicators: String =
    """input:
      |    config: indicators.yml
      |
      |higher-is-better: true
      |aggregation: geomean
      |values:
      |    - Ratio
      |
      |series:
      |    - Prefix
      |    - Mode
      |
      |axis:
      |    - Domain
      |
      |variants:
      |    - Arch
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/raw/umath-native.yml, verbatim — a REPLACE
    * line-filter rule rewrites the native env marker into the Prefix
    * value before CSV parse; aggregation is `min` (best-of CPE). */
  val rawUmathNative: String =
    """input:
      |    path: 'runs/*/*/*/*_umath_native*.out'
      |    format: csv
      |    filter:
      |        '^native_ha': 'Native-C'
      |        '^Native-C':
      |        '^Prefix':
      |        '^Overhead': drop
      |
      |aggregation: min
      |
      |axis:
      |- Size
      |- Function
      |
      |series:
      |- Prefix
      |- Implementation
      |
      |variants:
      |    - Mode
      |    - Arch
      |
      |higher-is-better: false
      |
      |values:
      |- "CPE"
      |
      |precomputed:
      |    Mode: "'Serial' if row['File'].split('.')[1].split('_')[-1] == 'seq' else 'Parallel'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |
      |number-format: 4
      |number-format-max-only: true
      |""".stripMargin

  /** examples/aggregations/raw/umath-python.yml, verbatim — a dotted/
    * colon column name ('CPE:aligned') renamed to the value column, and
    * `filter-out Prefix: [Prefix]` removing stray repeated header rows
    * that the keep-rule let through as data. */
  val rawUmathPython: String =
    """input:
      |    path: 'runs/*/*/*/*_umath_python*.out'
      |    format: csv
      |    filter:
      |        '^(stockpython3|intelpython3|Prefix)':
      |        '^Overhead': drop
      |        '^Unaligned': drop
      |rename:
      |    'CPE:aligned': 'CPE'
      |
      |aggregation: mean
      |
      |axis:
      |- Size
      |- Function
      |
      |series:
      |- Prefix
      |- Implementation
      |
      |variants:
      |    - Mode
      |    - Arch
      |
      |higher-is-better: false
      |
      |values:
      |- "CPE"
      |
      |precomputed:
      |    Mode: "'Serial' if row['File'].split('.')[1].split('_')[-1] == 'seq' else 'Parallel'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |
      |filter-out:
      |    Prefix: [Prefix]
      |
      |number-format: 4
      |number-format-max-only: true
      |""".stripMargin

  /** examples/aggregations/indicators/arithmetics-mkl.yml, verbatim. */
  val arithmeticsMkl: String =
    """input:
      |    config:
      |    - ../raw/umath-python.yml
      |    - ../raw/umath-native.yml
      |
      |aggregation: mean
      |
      |axis:
      |    - Mode
      |    - Size
      |    - Function
      |
      |series:
      |     - Prefix
      |     - Implementation
      |
      |variants:
      |    - Arch
      |
      |higher-is-better: false
      |
      |values:
      |    - Ratio
      |
      |precomputed:
      |    Domain: "'Numpy'"
      |    Ratio: "1 / ratio_of('CPE', Prefix='Native-C', Implementation='VML')"
      |
      |filter-in:
      |    Implementation:
      |    - numpy
      |    - numexpr
      |
      |number-format: 3
      |""".stripMargin

  /** examples/aggregations/indicators/arithmetics-numba.yml, verbatim. */
  val arithmeticsNumba: String =
    """input:
      |    config:
      |    - ../raw/umath-python.yml
      |    - ../raw/umath-native.yml
      |
      |aggregation: mean
      |
      |axis:
      |    - Mode
      |    - Size
      |    - Function
      |
      |series:
      |     - Prefix
      |     - Implementation
      |
      |variants:
      |    - Arch
      |
      |higher-is-better: false
      |
      |values:
      |    - Ratio
      |
      |precomputed:
      |    Domain: "'Numba'"
      |    Ratio: 1 / ratio_of('CPE', Prefix='Native-C', Implementation='SVML')
      |
      |filter-in:
      |    Implementation:
      |    - numba
      |
      |number-format: 3
      |""".stripMargin

  /** examples/aggregations/raw/linalg.yml, verbatim — the python ibench
    * scan: an EMPTY filter pattern keeps every line ('@'-prefixed lines
    * dropped), Prefix derives from the env directory. */
  val rawLinalg: String =
    """input:
      |    path: 'runs/*/*/*/*_ibench*.out'
      |    format: csv
      |    filter:
      |        '^@': drop
      |        '':
      |
      |aggregation: min
      |
      |axis:
      |- Function
      |- Size
      |
      |series:
      |- Prefix
      |
      |variants:
      |- Arch
      |- Mode
      |
      |higher-is-better: false
      |
      |values:
      |- Time
      |
      |precomputed:
      |    Mode: "'Serial' if row['File'].split('.')[1].split('_')[2] == 'seq' else 'Parallel'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |    Prefix: "(lambda p: 'Native-C' if p == 'native' else p)(row['Directory'].split('/')[-1])"
      |    Implementation: "'numpy' if row['Function'] in ('Dot', 'Det', 'Inv') else 'scipy'"
      |
      |filter-in:
      |
      |filter-out:
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/raw/linalg-native.yml, verbatim — per-function
    * file globs; Function self-overwrites through capitalize() and the
    * LATER Implementation precompute reads the capitalized value. */
  val rawLinalgNative: String =
    """input:
      |    path:
      |        - 'runs/*/*/*/*cholesky_native*.out'
      |        - 'runs/*/*/*/*det_native*.out'
      |        - 'runs/*/*/*/*dot_native*.out'
      |        - 'runs/*/*/*/*inv_native*.out'
      |        - 'runs/*/*/*/*eig_native*.out'
      |        - 'runs/*/*/*/*lu_native*.out'
      |        - 'runs/*/*/*/*qr_native*.out'
      |        - 'runs/*/*/*/*svd_native*.out'
      |    format: csv
      |
      |aggregation: min
      |
      |axis:
      |- Function
      |- Size
      |
      |series:
      |- Prefix
      |
      |variants:
      |- Arch
      |- Mode
      |
      |higher-is-better: false
      |
      |values:
      |- Time
      |
      |precomputed:
      |    Function: "row['Function'].capitalize()"
      |    Mode: "'Serial' if row['File'].split('.')[1].split('_')[-1] == 'seq' else 'Parallel'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |    Implementation: "'numpy' if row['Function'] in ('Dot', 'Det', 'Inv') else 'scipy'"
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/indicators/linalg.yml, verbatim — TWO value
    * columns (Ratio and Time) and a vestigial Name->Function rename that
    * no-ops on these children. */
  val indicatorsLinalg: String =
    """input:
      |    config:
      |        - ../raw/linalg.yml
      |        - ../raw/linalg-native.yml
      |
      |aggregation: mean
      |
      |axis:
      |    - Function
      |    - Size
      |
      |series:
      |    - Prefix
      |
      |variants:
      |    - Mode
      |    - Arch
      |
      |higher-is-better: true
      |
      |values:
      |    - Ratio
      |    - Time
      |
      |rename:
      |    Name: Function
      |
      |precomputed:
      |    Domain: "'Linear Algebra'"
      |    Ratio: "1 / ratio_of('Time', Prefix='Native-C')"
      |    drop: "row['Prefix'] == 'Native-C'"
      |
      |filter-in:
      |    drop: [false]
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/raw/sklearn.yml, verbatim — DataFrame-mode
    * precomputes copying lowercase CSV columns to capitalized names,
    * fillna on the classes column, and filter-out over nullable
    * solver/svd_solver columns (null rows kept, pandas ~isin parity). */
  val rawSklearn: String =
    """input:
      |    path:
      |       - 'runs/*/sklearn_python/*/*.out'
      |       - 'runs/*/sklearn_daal4py/*/*.out'
      |    format: csv
      |    filter:
      |        "@ Package 'daal4py' was not found. Number of threads is being ignored": drop
      |        "WARNING: Number of actual iterations.*": drop
      |        "Tolerance: .*": drop
      |        '':
      |
      |aggregation: median
      |
      |axis:
      |    - Function
      |    - Size
      |    - Classes
      |
      |series:
      |    - Prefix
      |
      |variants:
      |    - Arch
      |    - Mode
      |
      |values:
      |    - Time
      |
      |higher-is-better: false
      |
      |precomputed:
      |    Prefix: "df['prefix']"
      |    Time: "df['time']"
      |    Size: "df['size']"
      |    Function: "df['function']"
      |    Classes: "df['classes'].fillna(value='n/a')"
      |    Mode: "'Serial' if row['threads'] == 1 or row['threads'] == '1' else 'Parallel'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |
      |filter-out:
      |    solver: [newton-cg]
      |    svd_solver: [daal]
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/raw/sklearn-stock.yml, verbatim — same files
    * as raw/sklearn minus the daal4py tree, constant Mode, and a
    * filter-in on the LOWERCASE pre-copy prefix column. */
  val rawSklearnStock: String =
    """input:
      |    path:
      |       - 'runs/*/sklearn_python/*/*.out'
      |    format: csv
      |    filter:
      |        "@ Package 'daal4py' was not found. Number of threads is being ignored": drop
      |        "WARNING: Number of actual iterations.*": drop
      |        "Tolerance: .*": drop
      |        '':
      |
      |aggregation: median
      |
      |axis:
      |    - Function
      |    - Size
      |    - Classes
      |
      |series:
      |    - Prefix
      |
      |variants:
      |    - Arch
      |    - Mode
      |
      |values:
      |    - Time
      |
      |higher-is-better: false
      |
      |precomputed:
      |    Prefix: "df['prefix']"
      |    Time: "df['time']"
      |    Size: "df['size']"
      |    Function: "df['function']"
      |    Classes: "df['classes'].fillna(value='n/a')"
      |    Mode: "'Threaded'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |
      |filter-in:
      |    prefix: [stockpython3]
      |
      |filter-out:
      |    solver: [newton-cg]
      |    svd_solver: [daal]
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/raw/sklearn-native.yml, verbatim — headerless
    * per-function files with an imposed csv-header whose Arch column the
    * Directory-derived precompute then overwrites. */
  val rawSklearnNative: String =
    """input:
      |    path:
      |        - 'runs/*/sklearn_native/*/*_distances*'
      |        - 'runs/*/sklearn_native/*/*_ridge*'
      |        - 'runs/*/sklearn_native/*/*_linear*'
      |        - 'runs/*/sklearn_native/*/*_kmeans*'
      |    format: csv
      |    csv-header: 'Batch,Arch,Prefix,Threads,Size,Function,Time'
      |    filter:
      |        "@ Package 'daal4py' was not found. Number of threads is being ignored": drop
      |        "WARNING: Number of actual iterations.*": drop
      |        "Tolerance: .*": drop
      |        '':
      |
      |aggregation: median
      |
      |axis:
      |    - Function
      |    - Size
      |
      |series:
      |    - Prefix
      |
      |variants:
      |    - Arch
      |    - Mode
      |
      |values:
      |    - Time
      |
      |higher-is-better: false
      |
      |precomputed:
      |    Mode: "'Serial' if row['Threads'] == 1 else 'Parallel'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/indicators/sklearn.yml, verbatim — all 8
    * reference children. Exercises a reciprocal ratio at aggregation:
    * median, a drop precompute with an `or` over a union-padded column,
    * and filter-out of the daal4py series. The df_clsf child's
    * 'Native-C-opt'/'Native-C-base' prefixes have no exact 'Native-C'
    * base rows for their functions, so their Ratio is null (pandas
    * aligned-division NaN), and they survive the drop filter — null
    * Ratio rows are part of the reference output. */
  val indicatorsSklearn: String =
    """input:
      |    config:
      |    - ../raw/sklearn.yml
      |    - ../raw/sklearn-stock.yml
      |    - ../raw/sklearn-native.yml
      |    - ../raw/pca-native.yml
      |    - ../raw/svm.yml
      |    - ../raw/logreg.yml
      |    - ../raw/df_clsf.yml
      |    - ../raw/df_regr.yml
      |
      |aggregation: median
      |
      |axis:
      |- Function
      |- Mode
      |series:
      |- Prefix
      |
      |variants:
      |- Arch
      |
      |higher-is-better: false
      |
      |values:
      |    - Ratio
      |
      |precomputed:
      |    Ratio: "1/ratio_of('Time', Prefix='Native-C')"
      |    Implementation: "'scikit-learn'"
      |    Domain: "'Scikit-Learn'"
      |    drop: "row['Prefix'] == 'Native-C' or row['Classes'] == 2"
      |
      |filter-out:
      |    Prefix: ['daal4py']
      |
      |filter-in:
      |    drop: [false]
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/indicators/daal4py.yml, verbatim — all 7
    * reference children (the daal4py rows come from raw/sklearn, the
    * Native-C ratio base from raw/sklearn-native; the other children's
    * rows are removed by the `drop != 'daal4py'` filter and only
    * contribute ratio-base groups for functions that die with them).
    * Exercises dict-order dependence THREE deep: `drop` reads the
    * ORIGINAL Prefix, then Prefix itself is overwritten to the constant
    * 'intelpython3' — and != on union-padded data follows Python (never
    * null). */
  val indicatorsDaal4py: String =
    """input:
      |    config:
      |    - ../raw/sklearn.yml
      |    - ../raw/sklearn-native.yml
      |    - ../raw/pca-native.yml
      |    - ../raw/svm.yml
      |    - ../raw/logreg.yml
      |    - ../raw/df_clsf.yml
      |    - ../raw/df_regr.yml
      |
      |aggregation: median
      |
      |axis:
      |- Function
      |- Mode
      |series:
      |- Prefix
      |
      |variants:
      |- Arch
      |
      |higher-is-better: false
      |
      |values:
      |    - Ratio
      |
      |precomputed:
      |    Ratio: "1/ratio_of('Time', Prefix='Native-C')"
      |    Implementation: "'daal4py'"
      |    Domain: "'daal4py'"
      |    drop: "row['Prefix'] != 'daal4py'"
      |    Prefix: "'intelpython3'"
      |
      |filter-in:
      |    drop: [false]
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/indicators/rng.yml, verbatim — the Random
    * domain indicator: ratio vs the Native-C base (computed BEFORE the
    * filter-in, on all brngs), then a boolean `drop` precompute filters
    * the base series itself out. */
  val indicatorsRng: String =
    """input:
      |    config:
      |    - ../raw/rng.yml
      |
      |aggregation: mean
      |
      |axis:
      |    - Mode
      |    - Function
      |
      |series:
      |    - Prefix
      |
      |variants:
      |    - Arch
      |
      |higher-is-better: true
      |
      |values:
      |    - Ratio
      |
      |rename:
      |    Dist: Function
      |
      |precomputed:
      |    Domain: "'Random'"
      |    Ratio: "1 / ratio_of('Time', Prefix='Native-C')"
      |    drop: "row['Prefix'] == 'Native-C'"
      |
      |filter-in:
      |    Brng: [MT19937]
      |    drop: [false]
      |
      |filter-out:
      |
      |number-format: 2
      |number-format-max-only: true
      |""".stripMargin

  /** examples/aggregations/raw/rng.yml, verbatim — exercises csv-header
    * imposition with a precompute that OVERWRITES one of the imposed
    * columns from its own prior value (Brng), an idiom no other ported
    * recipe has: `Implementation` must read the PRE-overwrite Brng
    * because dict order runs it first. */
  val rawRng: String =
    """input:
      |    path:
      |        runs/*/*/*/*_rng_*.out
      |    format: csv
      |    csv-header: "Prefix, Brng, Dist, Time"
      |
      |aggregation: mean
      |
      |axis:
      |- Brng
      |- Dist
      |
      |series:
      |- Prefix
      |
      |variants:
      |    - Arch
      |
      |higher-is-better: true
      |
      |values:
      |    - Time
      |
      |precomputed:
      |    Implementation: "'numpy' if row['Brng'] == 'None' else 'mkl_random'"
      |    Brng: "'MT19937' if row['Brng'] == 'None' else row['Brng']"
      |    Mode: "'Serial'"
      |    Prefix: "(lambda p: 'Native-C' if p == 'native' else p)(row['Directory'].split('/')[-1])"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |
      |number-format: 2
      |number-format-max-only: true
      |""".stripMargin

  /** examples/aggregations/raw/svm.yml, verbatim — the prefix_ID REPLACE
    * rule carries the header through while '^(Native-C)' keeps only the
    * native rows; rename -> pack melts fit/predict into Function/Time;
    * Mode uses the bare `threads == 1` idiom (numeric threads). */
  val rawSvm: String =
    """input:
      |    path: 'runs/*/*/*/*_svm.out'
      |    format: csv
      |    filter:
      |        'prefix_ID': 'Prefix'
      |        '^(Native-C)':
      |aggregation: mean
      |
      |axis:
      |    - Size
      |    - classes
      |    - features
      |    - Mode
      |    - Function
      |
      |series:
      |    - Prefix
      |
      |rename:
      |    fit: SVM.fit
      |    predict: SVM.predict
      |
      |pack:
      |    - columns: [SVM.fit, SVM.predict]
      |      name: Function
      |      value: Time
      |
      |values:
      |    - Time
      |
      |variants:
      |    - Arch
      |
      |higher-is-better: false
      |
      |precomputed:
      |    Size: "'{}x{}'.format(row['rows'], row['features'])"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |    Mode: "'Serial' if row['threads'] == 1 else 'Parallel'"
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/raw/logreg.yml, verbatim — '^@' drop rule,
    * the int() cast idiom inside .format, filter-out over numeric
    * classes, and a filter-in pinning the solver axis column. */
  val rawLogreg: String =
    """input:
      |    path: 'runs/*/*/*/*_log_reg.out'
      |    format: csv
      |    filter:
      |        'prefix_ID': 'Prefix'
      |        '^@': drop
      |        '^Native-C':
      |aggregation: mean
      |
      |axis:
      |    - Size
      |    - classes
      |    - Mode
      |    - Function
      |    - solver
      |
      |series:
      |    - Prefix
      |
      |values:
      |    - Time
      |
      |rename:
      |    fit: LogReg.fit
      |    predict: LogReg.predict
      |
      |pack:
      |    - columns: [LogReg.fit, LogReg.predict]
      |      name: Function
      |      value: Time
      |
      |variants:
      |    - Arch
      |
      |higher-is-better: false
      |
      |precomputed:
      |    Size: "'{}x{}'.format(int(row['rows']), int(row['features']))"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |    Mode: "'Serial' if row['threads'] == 'Serial' or row['threads'] == 1 else 'Parallel'"
      |
      |filter-out:
      |    classes: [2, 3]
      |
      |filter-in:
      |    solver: [lbfgs]
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/raw/df_regr.yml, verbatim — the df_clsf
    * sibling without classes; threads mixes 'Serial' strings with
    * numbers, exercising the `== 'Serial' or == 1` disjunct. */
  val rawDfRegr: String =
    """input:
      |    path: 'runs/*/*/*/*_df_regr.out'
      |    format: csv
      |    filter:
      |        'prefix_ID': 'Prefix'
      |        '^@': drop
      |        '^Native-C':
      |aggregation: mean
      |
      |axis:
      |    - Size
      |    - Mode
      |    - Function
      |
      |series:
      |    - Prefix
      |
      |rename:
      |    fit: df_regr.fit
      |    predict: df_regr.predict
      |
      |pack:
      |    - columns: [df_regr.fit, df_regr.predict]
      |      name: Function
      |      value: Time
      |
      |values:
      |    - Time
      |
      |variants:
      |    - Arch
      |
      |higher-is-better: false
      |
      |precomputed:
      |    Size: "'{}x{}'.format(row['rows'], row['features'])"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |    Mode: "'Serial' if row['threads'] == 'Serial' or row['threads'] == 1 else 'Parallel'"
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/raw/pca-native.yml, verbatim — an 8-column
    * imposed csv-header plus the sklearn noise-drop filter block; the
    * filter-out column `svd_solver` is NOT in the header — it can only
    * exist via a .meta sidecar (S6), which is how the fixture ships it
    * (pandas raises KeyError otherwise). */
  val rawPcaNative: String =
    """input:
      |    path:
      |       - 'runs/*/sklearn_native/*/*_pca*'
      |    format: csv
      |    csv-header: 'Batch,Arch,Prefix,Threads,Size,n_components,Function,Time'
      |    filter:
      |        "@ Package 'daal4py' was not found. Number of threads is being ignored": drop
      |        "WARNING: Number of actual iterations.*": drop
      |        "Tolerance: .*": drop
      |        '':
      |
      |aggregation: median
      |
      |axis:
      |    - Function
      |    - Size
      |
      |series:
      |    - Prefix
      |
      |variants:
      |    - Arch
      |    - Mode
      |
      |values:
      |    - Time
      |
      |higher-is-better: false
      |
      |precomputed:
      |    Mode: "'Serial' if row['Threads'] == 1 else 'Parallel'"
      |    Arch: "(row['Directory'].split('/')[-3].split('_')[-3:-2]+['Unknown'])[0]"
      |
      |filter-out:
      |    svd_solver: [daal]
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/blackscholes.yml, verbatim — the top-level
    * summary over raw/blackscholes.yml and the corpus's only THREE-kwarg
    * ratio_of: Efficiency pins Prefix, Implementation AND Accuracy; the
    * filter-in then keeps the single Parallel/2097152/ha slice. */
  val blackscholesSummary: String =
    """input:
      |    config:
      |    - raw/blackscholes.yml
      |
      |aggregation: mean
      |
      |axis:
      |    - Size
      |
      |series:
      |    - Prefix
      |    - Implementation
      |    - Accuracy
      |
      |variants:
      |    - Mode
      |    - Arch
      |
      |higher-is-better: true
      |
      |values:
      |    - Efficiency
      |
      |precomputed:
      |    Efficiency: "ratio_of('MOPS', Prefix='Native-C', Implementation='SVML', Accuracy='ha')"
      |
      |filter-in:
      |    Mode:
      |    - Parallel
      |    Size:
      |    - 2097152
      |    Accuracy: [ha]
      |
      |filter-out:
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** examples/aggregations/sklearn.yml, verbatim — the top-level summary
    * over indicators/sklearn.yml. Carries the reference's `precompute:`
    * TYPO key (not `precomputed:`) — an unknown key the engine ignores
    * exactly like the reference does, so np.max is never evaluated —
    * plus filter-ins on Arch/Mode and a case-mismatched Function
    * filter-out that no-ops on the actual data. */
  val sklearnSummary: String =
    """input:
      |    config:
      |    - indicators/sklearn.yml
      |
      |aggregation: median
      |
      |axis:
      |- Function
      |
      |series:
      |- Prefix
      |
      |variants:
      |- Arch
      |- Mode
      |
      |higher-is-better: false
      |
      |values:
      |    - Ratio
      |
      |precompute:
      |    Ratio: "np.max(df['Ratio'], 0.01)"
      |
      |filter-in:
      |    Arch: [Xeon]
      |    Mode: [Parallel]
      |
      |filter-out:
      |    Function: [logreg.fit, logreg.predict]
      |
      |number-format: 2
      |number-format-max-only: false
      |""".stripMargin

  /** NOT one of the 28 verbatim recipes: sklearn.yml with the
    * reference's commented-out `expected:` block (sklearn.yml:17-21)
    * RESTORED. The reference ships the block only as a comment, so no
    * verbatim recipe can exercise the expected-fill (A7) and
    * expected-ordering (A8) paths end-to-end; this derived recipe is
    * exactly what the reference would run with the comment removed.
    * None of the three listed prefixes occur in the sklearn indicator
    * output (fixtures emit intelpython3/stockpython3), so every
    * (Function × expected-prefix) combo is filled with a null row —
    * oracle-checked by q69. Written OUTSIDE [[ReferenceCorpus
    * .recipeFiles]] so CorpusParitySpec's 28-recipe verbatim gate is
    * untouched. */
  val sklearnSummaryExpected: String =
    sklearnSummary.replace(
      "series:\n- Prefix\n",
      """series:
        |- Prefix
        |
        |expected:
        |- [StockPython]
        |- [IntelPython]
        |- [Native-C]
        |""".stripMargin)

  /** Goal rows shaped like examples/aggregations/targets.csv: unioned as
    * a side input by indicators.yml. The scalar*array row exercises the
    | Function filter-out; the rest lack Domain/Arch and are dropped by
    | the pandas groupby-dropna parity at the summary layer. */
  val targetsCsv: String =
    """Function,Ratio,Prefix,Mode,Implementation
      |array*array,0.8,IntelPython,Goal,numpy
      |array+array,0.85,IntelPython,Goal,numpy
      |scalar*array,0.7,IntelPython,Goal,numpy
      |""".stripMargin
}
