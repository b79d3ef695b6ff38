package graft.core

/** O10 — environment resolution from job name (`comlib.py:27-56`,
  * `Airflow_week.py:15-19`): job names carry an `_dev`/`_stg`/`_prd`
  * suffix that selects the config set; malformed names fail fast
  * (`comlib.py:41-49` raises on unknown env).
  */
object EnvConfig {

  val KnownEnvs: Set[String] = Set("dev", "stg", "prd")

  /** `"jobname_dev"` → `("jobname", "dev")`; anything else raises. */
  def parseJobName(name: String): (String, String) = {
    val idx = name.lastIndexOf('_')
    require(idx > 0 && idx < name.length - 1, s"malformed job name: $name")
    val (base, env) = (name.substring(0, idx), name.substring(idx + 1))
    require(KnownEnvs.contains(env), s"unknown env '$env' in job name: $name")
    (base, env)
  }

  /** Env-keyed config selection (config-as-data, `comlib.py:59-85`). */
  def resolve[A](env: String, byEnv: Map[String, A]): A = {
    require(KnownEnvs.contains(env), s"unknown env: $env")
    byEnv.getOrElse(env,
      throw new IllegalArgumentException(s"no config for env: $env"))
  }
}
